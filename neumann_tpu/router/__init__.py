"""Query router: parse + dispatch to engines, result types, pagination."""

from neumann_tpu.router.router import QueryResult, QueryRouter  # noqa: F401
