"""Reader-cursor operators: point/seek/prefix/range lookups over sorted keys.

Analogs of grenad's ReaderCursor surface (reference
src/reader/reader_cursor.rs:91-219, prefix_iter.rs, range_iter.rs) expressed
as pruned DataFrame scans. The prefix→range rewrite mirrors `advance_key`
(src/reader/prefix_iter.rs:84-94): a startswith predicate becomes
[prefix, successor(prefix)), which range-partitioned storage prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def advance_key(key: bytes) -> bytes | None:
    """Smallest byte string strictly greater than every string prefixed by
    `key` — carry-propagating increment (grenad advance_key,
    src/reader/prefix_iter.rs:84-94). None when key is all 0xFF (no upper
    bound exists)."""
    b = bytearray(key)
    while b:
        if b[-1] == 0xFF:
            b.pop()
        else:
            b[-1] += 1
            return bytes(b)
    return None


def advance_str(prefix: str) -> str | None:
    """String-domain successor for text keys (used for range pruning of
    startswith predicates over term dictionaries)."""
    b = advance_key(prefix.encode("utf-8"))
    return b.decode("utf-8", errors="surrogateescape") if b is not None else None


def point_lookup(sorted_df: DataFrame, key_col: str, key) -> DataFrame:
    """move_on_key_equal_to (src/reader/reader_cursor.rs:211-219)."""
    return sorted_df.filter(F.col(key_col) == key)


def seek_gte(sorted_df: DataFrame, key_col: str, key) -> DataFrame:
    """First entry with key >= target (src/reader/reader_cursor.rs:184-209)."""
    return sorted_df.filter(F.col(key_col) >= key).orderBy(key_col).limit(1)


def seek_lte(sorted_df: DataFrame, key_col: str, key) -> DataFrame:
    """Last entry with key <= target (src/reader/reader_cursor.rs:167-182)."""
    return sorted_df.filter(F.col(key_col) <= key).orderBy(F.desc(key_col)).limit(1)


def first_entry(sorted_df: DataFrame, key_col: str) -> DataFrame:
    """move_on_first (src/reader/reader_cursor.rs:91-110)."""
    return sorted_df.orderBy(key_col).limit(1)


def last_entry(sorted_df: DataFrame, key_col: str) -> DataFrame:
    """move_on_last (src/reader/reader_cursor.rs:112-129)."""
    return sorted_df.orderBy(F.desc(key_col)).limit(1)


def prefix_iter(sorted_df: DataFrame, key_col: str, prefix: str, reverse: bool = False) -> DataFrame:
    """PrefixIter / RevPrefixIter (src/reader/prefix_iter.rs:8-94): rewritten
    to a half-open range so the predicate prunes range partitions instead of
    scanning + startswith-filtering."""
    succ = advance_str(prefix)
    cond = F.col(key_col) >= prefix
    if succ is not None:
        cond = cond & (F.col(key_col) < succ)
    out = sorted_df.filter(cond)
    return out.orderBy(F.desc(key_col)) if reverse else out.orderBy(key_col)


def range_iter(
    sorted_df: DataFrame,
    key_col: str,
    lo=None,
    hi=None,
    lo_inclusive: bool = True,
    hi_inclusive: bool = False,
    reverse: bool = False,
) -> DataFrame:
    """RangeIter / RevRangeIter with Included/Excluded/Unbounded bounds
    (src/reader/range_iter.rs:8-133)."""
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(key_col) >= lo if lo_inclusive else F.col(key_col) > lo)
    if hi is not None:
        cond = cond & (F.col(key_col) <= hi if hi_inclusive else F.col(key_col) < hi)
    out = sorted_df.filter(cond)
    return out.orderBy(F.desc(key_col)) if reverse else out.orderBy(key_col)
