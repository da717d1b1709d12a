"""sf1 value check for the RECURSIVE-CTE oracle entries via Python
reference models (VERDICT r8 Next #7).

The sf1 sweep (tools/sf1_slope.py + check_oracle) value-checks every
non-recursive oracle one decade above the driver gate, but the 8
cluster/curate/split entries were excluded by class: their DuckDB
oracles walk the near-dup edge graph with a recursive CTE (and the
edge CTE itself is the O(n²-per-block) pairwise join), which does not
finish at sf1. This tool closes that residue WITHOUT DuckDB: the
recursion and everything downstream of it — exactly the logic the
excluded oracles exist to check — is recomputed in pure Python
(union-find, winner election, hashlib md5 split buckets, dict
roll-ups) and compared BY VALUE to the Spark entries' sf1 outputs.

What the models take as INPUT, and why that is honest: the pairwise
edge sets (ngram_jaccard_pairs / fuzzy_match_pairs / dhash pairs), the
per-doc quality scores, and the exact-dedup keeper sets are Spark
OPERATOR outputs — each of those operators is independently
value-hash-checked against DuckDB at sf0.01/sf0.1 (dedup_ngram_jaccard,
match_fuzzy_parts, multimodal_dhash_pairs, text_quality, dedup_exact),
and they are deterministic, so re-deriving them in Python would
re-test what is already cross-engine-proven. The UNPROVEN-at-sf1 part
is the recursion seam: components over ~10x the edges, elections,
splits, roll-ups. That seam is what these models recompute from
scratch.

Usage:
    PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell" \\
        python tools/sf1_recursive_check.py [--sf /root/repo/.scratch/sf1] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
from collections import defaultdict

sys.path.insert(0, ".")


class UnionFind:
    """Min-label union-find: find() returns the smallest member seen in
    the set so far once compressed via label(); matches the operators'
    'min reachable id' contract."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # root at the SMALLER value so find() converges to min-id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo

    def labels(self) -> dict:
        return {x: self.find(x) for x in list(self.parent)}


def _components(edges) -> dict:
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return uf.labels()


def _md5_bucket(seed: int, key) -> int:
    h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:8]
    return int(h, 16) % 10_000


def _split_of(bucket: int, weights: list[tuple[str, float]]) -> str:
    total = sum(w for _, w in weights)
    acc = 0.0
    for name, w in weights[:-1]:
        acc += w / total * 10_000
        if bucket < int(round(acc)):
            return name
    return weights[-1][0]


def _rows(df):
    return [tuple(r) for r in df.collect()]


def check(name: str, got_rows, want_rows) -> bool:
    got, want = sorted(got_rows), sorted(want_rows)
    ok = got == want
    if ok:
        print(f"ok    {name}: {len(got)} rows match the Python model")
    else:
        gs, ws = set(got), set(want)
        print(f"FAIL  {name}: spark {len(got)} rows vs model {len(want)}")
        print("  spark-only:", sorted(gs - ws)[:3])
        print("  model-only:", sorted(ws - gs)[:3])
    return ok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.scratch/sf1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from erpl_web_spark.operators._cache import release_tracked
    from erpl_web_spark.operators.dedup import ngram_jaccard_pairs
    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import load

    spark = get_spark("sf1-recursive-check")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    sf = args.sf

    # shared inputs: the cross-engine-proven operator outputs at sf1.
    # The blocked-quadratic edge join is the dominant cost at sf1
    # (~10k-doc lang blocks), and five of the entries rebuild the
    # PLAN-IDENTICAL frame internally — persist it once and the
    # CacheManager's logical-plan matching serves every entry from the
    # materialized pairs instead of re-running the join per entry
    # (measured: the naive per-entry form puts ~6 multi-hour joins in
    # one run). Do NOT release_tracked() between entries for the same
    # reason.
    docs = load(spark, sf, "documents", spread=True)
    pairs_frame = ngram_jaccard_pairs(
        docs, "doc_id", "text", block_cols=["lang"], shingle_k=3, threshold=0.3
    ).persist()
    edges = [(r["id_a"], r["id_b"]) for r in pairs_frame.collect()]
    comp = _components(edges)
    print(f"# sf1 corpus: {len(edges)} near-dup edges, "
          f"{len(set(comp.values()))} components over {len(comp)} member docs")

    results: dict[str, bool] = {}

    def run(name: str, model_fn) -> None:
        if args.names and name not in args.names:
            return
        got = _rows(queries[name](spark, sf))
        results[name] = check(name, got, model_fn())

    # -- dedup_cluster_components: (id, component = min reachable id)
    run("dedup_cluster_components", lambda: list(comp.items()))

    # -- dedup_cluster_summary: (component, n_members, member_min, member_max)
    def model_summary():
        agg: dict = {}
        for i, c in comp.items():
            n, lo, hi = agg.get(c, (0, i, i))
            agg[c] = (n + 1, min(lo, i), max(hi, i))
        return [(c, n, lo, hi) for c, (n, lo, hi) in agg.items()]

    run("dedup_cluster_summary", model_summary)


    # -- dedup_source_overlap: per unordered source pair over the edges
    def model_source_overlap():
        src = {r["doc_id"]: r["source"]
               for r in docs.select("doc_id", "source").collect()}
        release_tracked()
        n_pairs: dict = defaultdict(int)
        docs_a: dict = defaultdict(set)
        for a, b in edges:
            sa, sb = src[a], src[b]
            key = (min(sa, sb), max(sa, sb))
            n_pairs[key] += 1
            docs_a[key].add(a if sa <= sb else b)
        return [(k[0], k[1], n_pairs[k], len(docs_a[k])) for k in n_pairs]

    run("dedup_source_overlap", model_source_overlap)

    # -- match_resolve_parts: fuzzy name components -> canonical rollup
    def model_resolve():
        from erpl_web_spark.operators.matching import fuzzy_match_pairs

        parts = load(spark, sf, "part", spread=True)
        name_pairs = [
            (r["name_a"], r["name_b"])
            for r in fuzzy_match_pairs(parts, "p_name", 4).collect()
        ]
        names = [r["p_name"] for r in parts.select("p_name").collect()]
        release_tracked()
        canon = _components(name_pairs)  # min = lexicographic on strings
        n_parts: dict = defaultdict(int)
        variants: dict = defaultdict(set)
        for n in names:
            c = canon.get(n, n)
            n_parts[c] += 1
            variants[c].add(n)
        return [(c, n_parts[c], len(variants[c])) for c in n_parts]

    run("match_resolve_parts", model_resolve)

    # -- pipeline_split_leak_safe: cluster label -> md5 bucket -> split
    def model_split():
        ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
        weights = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
        out = []
        for i in ids:
            gk = comp.get(i, i)
            out.append((i, gk, _split_of(_md5_bucket(42, gk), weights)))
        return out

    run("pipeline_split_leak_safe", model_split)

    # -- pipeline_curate_corpus: exact keep -> near reps -> quality -> stats
    def model_curate_corpus():
        from erpl_web_spark.operators.dedup import exact_dedup_report
        from erpl_web_spark.operators.text import tokens_expr, with_quality_score

        keep_ids = {
            r["keep_id"]
            for r in exact_dedup_report(docs, "doc_id", "text").collect()
        }
        quality = {
            r["doc_id"]: r["quality_keep"]
            for r in with_quality_score(docs).select(
                "doc_id", "quality_keep").collect()
        }
        meta = {
            r["doc_id"]: (r["lang"], r["n_chars"], r["n_toks"])
            for r in docs.select(
                "doc_id", "lang",
                F.length("text").cast("bigint").alias("n_chars"),
                F.size(tokens_expr(F.col("text"))).cast("bigint").alias("n_toks"),
            ).collect()
        }
        release_tracked()
        agg: dict = defaultdict(lambda: [0, 0, 0])
        for i, (lang, nc, nt) in meta.items():
            if i not in keep_ids or not quality[i]:
                continue
            if comp.get(i, i) != i:  # not its cluster's representative
                continue
            a = agg[lang]
            a[0] += 1
            a[1] += nc
            a[2] += nt
        return [(lang, a[0], a[1], a[2]) for lang, a in agg.items()]

    run("pipeline_curate_corpus", model_curate_corpus)

    # -- pipeline_pack_nextfit: per-shard next-fit scan (recursive-CTE
    # oracle at small SFs; here the same scan in Python). n_tokens
    # enters as the cross-checked token count (text_stats is value-
    # hash green at sf1); the md5 shard bucket is recomputed in
    # hashlib; the packing recursion is what the model re-derives.
    def model_pack_nextfit():
        import hashlib

        from erpl_web_spark.operators.text import token_count_expr

        rows = docs.select(
            "doc_id", token_count_expr(F.col("text")).cast("long").alias("n")
        ).collect()
        release_tracked()
        shards: dict = defaultdict(list)
        for r in rows:
            h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:12], 16)
            shards[h % 8].append((r["doc_id"], r["n"]))
        out = []
        for shard, members in shards.items():
            bin_id, fill, first = 0, 0, True
            for doc_id, t in sorted(members):
                if not first and fill + t > 64:
                    bin_id += 1
                    fill = 0
                fill += t
                first = False
                out.append((shard, doc_id, t, bin_id, fill))
        return out

    run("pipeline_pack_nextfit", model_pack_nextfit)

    # -- dedup_cluster_minhash_md5: union-find over the md5 pair
    # entry's own output — legitimate because dedup_minhash_lsh_md5 is
    # itself value-hash-checked at sf1 (round 9); the components
    # recursion is the seam the model re-derives. Costs one extra pair
    # computation (the entries share no persisted frame).
    def model_cluster_minhash_md5():
        pair_df = queries["dedup_minhash_lsh_md5"](spark, sf)
        md5_edges = [
            (r["id_a"], r["id_b"])
            for r in pair_df.select("id_a", "id_b").collect()
        ]
        release_tracked()
        return list(_components(md5_edges).items())

    run("dedup_cluster_minhash_md5", model_cluster_minhash_md5)

    # -- dedup_keep_best LAST: its planted-corpus pair join is a second
    # full quadratic pass (the en lang block alone is ~C(30k,2) exact
    # Jaccards in one task at sf1) and must not gate the five entries
    # that reuse the already-persisted main pair frame
    # --: planted zz block + quality election
    def model_keep_best():
        from erpl_web_spark.operators.text import with_quality_score
        from erpl_web_spark.suite.pipeline import _KB_BASE, _KB_TAILS

        # The entry localCheckpoints its planted union (suite/pipeline
        # dedup_keep_best), so no logical plan built here can ever match
        # the entry's in the CacheManager — the model PAYS ITS OWN pair
        # join (the second quadratic pass this block's header comment
        # warns about). What the model must therefore mirror is the
        # entry's MATERIALIZATION, not its plan: persist+count the
        # planted union before the pairwise verifier, because the raw
        # union-with-crossJoin input has no stats and Catalyst plans the
        # block join as an interpreted SortMergeJoin (~10-20x per pair
        # vs the codegen BroadcastHashJoin a cached input gets —
        # ngram_jaccard_pairs docstring, round-9 measurement).
        d = docs.select("doc_id", "lang", "text")
        base = d.agg((F.max("doc_id") + F.lit(1)).alias("_b"))
        bad = spark.createDataFrame(
            [(i, f"{_KB_BASE} {t}") for i, t in enumerate(_KB_TAILS)],
            "off long, t string",
        )
        planted = bad.crossJoin(F.broadcast(base)).select(
            (F.col("off") + F.col("_b")).alias("doc_id"),
            F.lit("zz").alias("lang"),
            F.col("t").alias("text"),
        )
        full = d.unionByName(planted).persist()
        full.count()
        kb_pairs = ngram_jaccard_pairs(
            full, "doc_id", "text", block_cols=["lang"],
            shingle_k=3, threshold=0.3,
        ).persist()
        kb_edges = [(r["id_a"], r["id_b"]) for r in kb_pairs.collect()]
        scores = {
            r["doc_id"]: r["quality_score"]
            for r in with_quality_score(full).select(
                "doc_id", "quality_score").collect()
        }
        kb_pairs.unpersist()
        full.unpersist()
        kb_comp = _components(kb_edges)
        best: dict = {}
        for i, c in kb_comp.items():
            s = scores[i]
            if c not in best or (s, -i) > (best[c][1], -best[c][0]):
                best[c] = (i, s)
        return [(c, i, s) for c, (i, s) in best.items()]

    run("dedup_keep_best", model_keep_best)

    pairs_frame.unpersist()
    release_tracked()
    n_ok = sum(results.values())
    print(f"\n{n_ok}/{len(results)} recursive-family entries match their "
          f"Python models at sf1")
    if n_ok != len(results):
        sys.exit(1)


if __name__ == "__main__":
    main()
