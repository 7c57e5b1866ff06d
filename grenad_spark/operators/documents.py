"""The documents endpoint — Meilisearch GET /indexes/{uid}/documents.

Meilisearch serves raw documents (optionally filtered, paginated, and
projected to `fields`) straight from its documents store, a grenad-backed
heed database keyed by internal doc id; iteration order is the key order.
Spark-first the same surface is a filter + key-ordered page over the
documents table:

- `fetch_documents(after=...)` is KEYSET pagination (doc_id > after, first
  `limit` ids) — the 10^12-row path: the predicate reaches the parquet scan
  (doc_id min/max prunes row groups), and the page is a
  TakeOrderedAndProject, never a global sort. This mirrors how a cursor
  walks grenad's sorted keys (reference src/reader/reader_cursor.rs:91-129:
  move_on_key_greater_than_or_equal_to + move_on_next).
- `offset=` mode exists for API parity (Meilisearch's offset/limit): the
  driver still only materializes offset+limit rows (ordered limit, then a
  local skip), but at web scale deep offsets are the classic anti-pattern —
  use keyset.
- `filter_expr` is a Spark SQL boolean expression over the document
  attributes (the Meilisearch filter grammar — `lang = 'en' AND n_chars >
  100` — is valid SQL for the operators Meilisearch supports: =, !=,
  <, <=, >, >=, IN, NOT, AND, OR).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fetch_documents(
    docs: DataFrame,
    fields: list[str],
    filter_expr: str | None = None,
    after: int | None = None,
    offset: int | None = None,
    limit: int = 20,
) -> DataFrame:
    """A deterministic page of documents in doc_id order, projected to
    `fields` (doc_id is always included first). Exactly one of `after`
    (keyset: doc_id strictly greater) / `offset` may be given; neither
    means the first page."""
    if after is not None and offset is not None:
        raise ValueError("pass keyset `after` OR `offset`, not both")
    cols = ["doc_id"] + [c for c in fields if c != "doc_id"]
    page = docs
    if filter_expr:
        page = page.filter(F.expr(filter_expr))
    if after is not None:
        page = page.filter(F.col("doc_id") > int(after))
    page = page.select(*cols).orderBy(F.asc("doc_id"))
    if offset:
        # ordered limit(offset+limit) keeps the plan a TakeOrdered; the skip
        # happens on that already-tiny page
        return page.limit(int(offset) + int(limit)).offset(int(offset))
    return page.limit(int(limit))


def sql_fetch_documents(
    fields: list[str],
    filter_expr: str | None = None,
    after: int | None = None,
    offset: int | None = None,
    limit: int = 20,
    table: str = "documents",
) -> str:
    cols = ["doc_id"] + [c for c in fields if c != "doc_id"]
    conds = []
    if filter_expr:
        conds.append(f"({filter_expr})")
    if after is not None:
        conds.append(f"doc_id > {int(after)}")
    where = f"WHERE {' AND '.join(conds)}" if conds else ""
    off = f" OFFSET {int(offset)}" if offset else ""
    return (
        f"SELECT {', '.join(cols)} FROM {table} {where} "
        f"ORDER BY doc_id ASC LIMIT {int(limit)}{off}"
    )
