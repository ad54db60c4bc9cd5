"""Legacy-path shim: metadata lives in pyproject.toml ([project] table,
which setuptools >= 61 reads here too). See the pyproject.toml note for
why the PEP 517 [build-system] table is omitted."""

from setuptools import setup

setup()
