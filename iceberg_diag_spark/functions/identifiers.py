"""Table identifier parsing (SURVEY §2 F5).

Mirrors the reference's ``Table`` value type
(``icebergdiag/metrics/table.py:1-22``): a (database, table_name)
pair, constructed either directly or by parsing a qualified
``"db.tbl"`` string.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Table:
    database: str
    table_name: str

    @classmethod
    def from_full_name(cls, full_table_name: str) -> "Table":
        """Parse ``"db.tbl"``: strip, then split on the FIRST dot, so
        ``"a.b.c"`` keeps dots in the table name → ("a", "b.c").

        Mirrors the reference exactly (``metrics/table.py:7-13``),
        including its quirk: a dotless input yields database="" with
        the ORIGINAL (unstripped) string as the table name.
        """
        parts = full_table_name.strip().split(".", 1)
        if len(parts) == 2:
            return cls(parts[0], parts[1])
        return cls("", full_table_name)

    def full_table_name(self) -> str:
        return f"{self.database}.{self.table_name}"

    def __str__(self) -> str:
        return self.full_table_name()
