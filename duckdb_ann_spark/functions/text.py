"""Text expressions: tokenization + BM25 building blocks.

Tokenization contract (shared by the Spark expressions and the DuckDB
oracle SQL, so scores hash-match): lowercase, split on `[^a-z0-9]+`,
drop empties. The same pattern drives `hybrid_search`'s BM25 leg and the
text-analysis operators (token counts, quality stats).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

__all__ = ["tokenize", "token_count", "sql_tokenize", "spark_sql_tokenize",
           "spark_sql_tokenize_expr", "sql_bind_once", "quote_ident",
           "py_tokenize", "TOKEN_SPLIT_RE"]


def quote_ident(name: str) -> str:
    """Backtick-quote a column name for embedding in a Spark SQL string.
    Without this, a name like `text-body` parses as subtraction and a
    reserved word errors — things `F.col()` handled transparently."""
    return "`" + name.replace("`", "``") + "`"


def sql_bind_once(value_sql: str, var: str, body_sql: str) -> str:
    """The SQL spelling of :func:`..functions.expr.bind_once`:
    ``element_at(transform(array(<value>), <var> -> <body>), 1)`` —
    evaluates `value_sql` ONCE per row and exposes it to `body_sql` as
    the lambda variable `var`. Single-sourced here so the load-bearing
    wrapper can't drift between the string-assembled expression sites."""
    return (
        f"element_at(transform(array({value_sql}), {var} -> {body_sql}), 1)"
    )


def tokenize(text: Column | str) -> Column:
    """array<string> of lowercase alphanumeric tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokenize(text))


def spark_sql_tokenize_expr(expr: str) -> str:
    """Spark SQL fragment producing the identical token list to
    :func:`tokenize` over an arbitrary SQL EXPRESSION — the canonical
    Spark-dialect spelling (suite CTEs and the dual-dialect corpus
    builders delegate here so the contract can't drift)."""
    return (
        f"filter(split(lower({expr}), '{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )


def spark_sql_tokenize(col_name: str) -> str:
    """:func:`spark_sql_tokenize_expr` over the COLUMN NAME given
    (backtick-quoted, so names `F.col` accepted keep working). Used to
    assemble big expression trees as ONE `F.expr()` string: the Python
    Column builders pay one py4j round-trip per node (a deep HOF tree
    costs seconds of driver time per plan), where a SQL string parses
    JVM-side in one call into the same Catalyst nodes."""
    return spark_sql_tokenize_expr(quote_ident(col_name))


def sql_tokenize(expr: str) -> str:
    """DuckDB fragment producing the identical token list."""
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT_RE}'), "
        f"t -> t <> '')"
    )


def py_tokenize(text: str) -> list[str]:
    """Driver-side twin (for query strings)."""
    import re

    return [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]
