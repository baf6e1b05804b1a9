"""Error taxonomy mirroring the reference's exception surface
(icebergdiag/exceptions.py: session/catalog/table/request error
classes), adapted to the Spark engine: callers can catch one family
instead of parsing AnalysisException strings.
"""

from __future__ import annotations


class DiagError(Exception):
    """Base class for all engine errors."""


class SessionInitError(DiagError):
    """SparkSession could not be created/validated (reference:
    SessionInitializationError)."""


class CatalogBindError(DiagError):
    """Catalog probe failed (reference: ProviderError /
    EndpointConnectionError paths)."""


class DatabaseNotFound(DiagError):
    """Namespace does not exist (reference: DatabaseNotFound from
    Glue EntityNotFoundException)."""

    def __init__(self, database: str):
        self.database = database
        super().__init__(f"database not found: {database}")


class TableNotFound(DiagError):
    """Table does not exist or has no Iceberg metadata (reference:
    TableMetricsCalculationError on load_table failure)."""

    def __init__(self, table: str):
        self.table = table
        super().__init__(f"table not found: {table}")


class NoMatchingTables(DiagError):
    """A glob pattern matched nothing (reference: cli exits with a
    'no tables matched' message)."""

    def __init__(self, database: str, pattern: str):
        self.database = database
        self.pattern = pattern
        super().__init__(f"no tables match {pattern!r} in {database}")
