"""Fuzzy entity matching: blocked edit-distance joins over name/key
dictionaries.

The reference has no matching operator; this extends the dedup family
(SURVEY §2 driver-mandated extensions) to *structured* identity — the
metadata-side complement of MinHash text dedup: product names, vendor
strings, and user handles arriving with typos must resolve to one
entity before joins or per-entity caps mean anything.

Design for scale:
- Resolution runs on the DISTINCT value dictionary, never the fact
  table. A 100 TB fact table with 10^6 distinct names costs a 10^6-row
  self-join, and the resulting assignment table broadcast-joins back to
  facts. `fuzzy_match_pairs` therefore takes (and internally enforces)
  a deduplicated dictionary.
- The quadratic verify is confined to blocks: candidate pairs share a
  cheap deterministic blocking key (default: the name's last
  whitespace token — swap in soundex/first-k-chars/length buckets per
  domain). Blocks shuffle as skinny (block_key, name) rows; the
  edit-distance only runs inside a block.
- `levenshtein` is a JVM built-in (no Python in the loop); the pair
  expansion is one groupBy + in-block expansion, the same shape as the
  MinHash bucket join (operators/dedup.py), so AQE can split a skewed
  block.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def last_token_block(col: Column) -> Column:
    """Default blocking key: the final whitespace-delimited token,
    lowercased. For 'acme corp' vs 'acme corp.' style data swap in a
    domain-specific key (soundex, prefix, length bucket)."""
    toks = F.split(F.trim(col), r"\s+")
    return F.lower(F.element_at(toks, -1))


def fuzzy_match_pairs(
    df: DataFrame,
    name_col: str,
    max_distance: int = 2,
    block_key: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """All distinct-name pairs within ``max_distance`` Levenshtein edits
    that share a blocking key. Output: (name_a, name_b, distance) with
    name_a < name_b — the edge set for `connected_components` when the
    match relation must become entity clusters. ``block_key`` maps the
    name column to the blocking key (default: last token).

    Blocking trades recall for tractability exactly like LSH banding:
    a pair in different blocks is never compared. The default last-token
    key finds 'red widget' ~ 'rd widget' but not 'red widget' ~
    'red widgets'; choose the key to match the error model.
    """
    key_fn = block_key if block_key is not None else last_token_block
    names = (
        df.select(F.col(name_col).alias("name"))
        .where(F.col("name").isNotNull())
        .distinct()
        .withColumn("__blk", key_fn(F.col("name")))
    )
    a = names.select(F.col("__blk"), F.col("name").alias("name_a"))
    b = names.select(F.col("__blk"), F.col("name").alias("name_b"))
    pairs = a.join(b, "__blk").where(F.col("name_a") < F.col("name_b"))
    return (
        pairs.withColumn(
            "distance", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .where(F.col("distance") <= max_distance)
        .select("name_a", "name_b", "distance")
    )


def resolve_entities(
    facts: DataFrame,
    name_col: str,
    max_distance: int = 2,
    block_key: Callable[[Column], Column] | None = None,
    out: str = "canonical_name",
) -> DataFrame:
    """Attach a canonical entity name to every fact row: fuzzy-match the
    distinct dictionary, cluster matches with connected components, pick
    the lexicographically-smallest member as canonical, and broadcast
    the (name -> canonical) assignment back onto the facts.

    The facts themselves never shuffle: the assignment table is
    dictionary-sized, so the final join is a broadcast hash join."""
    pairs = fuzzy_match_pairs(facts, name_col, max_distance, block_key)
    clusters = name_components(pairs, "name_a", "name_b")
    assignment = clusters.select(
        F.col("name").alias(name_col), F.col("canonical").alias(out)
    )
    joined = facts.join(F.broadcast(assignment), name_col, "left")
    return joined.withColumn(out, F.coalesce(F.col(out), F.col(name_col)))


def name_components(
    pairs: DataFrame, a_col: str = "name_a", b_col: str = "name_b"
) -> DataFrame:
    """String-keyed connected components: (name, canonical) where
    canonical is the lexicographically-smallest name in the match
    cluster.

    Bridges the long-keyed `connected_components` operator: names get
    xxhash64 surrogate ids (collision odds ~n²/2⁶⁴ — negligible below
    ~10⁹ distinct names; use a salted 128-bit scheme past that), the
    label propagation runs on (long, long) rows, and the canonical
    member is re-derived as MIN(name) per component so hash ordering
    never leaks into the output."""
    from erpl_web_spark.operators.graph import connected_components

    edges = pairs.select(
        F.xxhash64(F.col(a_col)).alias("src"),
        F.xxhash64(F.col(b_col)).alias("dst"),
    )
    labels = connected_components(edges, "src", "dst")
    names = (
        pairs.select(F.col(a_col).alias("name"))
        .union(pairs.select(F.col(b_col).alias("name")))
        .distinct()
        .withColumn("nid", F.xxhash64(F.col("name")))
    )
    labeled = names.join(labels, names["nid"] == labels["id"]).select(
        "name", "component"
    )
    canon = labeled.groupBy("component").agg(
        F.min("name").alias("canonical")
    )
    return labeled.join(canon, "component").select("name", "canonical")
