"""Legacy-path shim: metadata lives in pyproject.toml ([project] table,
which setuptools >= 61 reads here too). pyproject.toml DOES declare the
PEP 517 [build-system] table; this shim exists for toolchains where the
PEP 660 editable install fails anyway (setuptools 65.5 without `wheel`,
as shipped in this repo's dev container) — there
`python setup.py develop --no-deps` is the working editable path, which
the gated packaging smoke exercises. See the pyproject [build-system]
note."""

from setuptools import setup

setup()
