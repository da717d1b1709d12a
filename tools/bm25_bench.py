"""BM25 query-join strategy decade-up: broadcast vs shuffle path.

Measures bm25_topk's two query-join contracts (VERDICT r13 Next #3)
under the workload each is FOR:

- ``broadcast_queries=True`` with a fixed 20-query benchmark set (the
  decontamination-lookup contract): the query term set should stay a
  broadcast-sized constant while the corpus decades up.
- ``broadcast_queries=False`` with queries == the corpus's own
  documents (the hard-negative-mining contract): the query term set is
  corpus-sized, so it must travel through a shuffle join on ``term``
  instead of being replicated to every task.

For each SF x path: wall-clock, shuffle read/write bytes (status REST
API, stage metrics diffed around the run), and a result checksum so
the two paths' equality is re-verified at every scale, not just in the
unit pytest. The broadcast path is also run (where feasible) on the
corpus-sized query set to show WHY the flag exists: replicating a
corpus-sized term set is the piece that stops scaling.

    python tools/bm25_bench.py [--sfs sf0.01,sf0.1] [--k 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def _stages(ui: str, app_id: str, status: str) -> list:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status={status}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _totals(ui: str, app_id: str) -> dict:
    for _ in range(20):
        if not _stages(ui, app_id, "active"):
            break
        time.sleep(0.25)
    time.sleep(0.75)
    tot = {"shuffle_read": 0, "shuffle_write": 0, "input": 0}
    for s in _stages(ui, app_id, "complete"):
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["input"] += s.get("inputBytes", 0)
    return tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="sf0.01,sf0.1")
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from erpl_web_spark.operators.text import bm25_topk
    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import load

    spark = get_spark("bm25-bench")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def checksum(df):
        # order-insensitive result digest: XOR-free integer sum of row hashes
        # pmod keeps the per-row term in [0, 1e9) so the sum cannot
        # overflow BIGINT under ANSI mode at any result size
        return df.select(
            F.sum(
                F.pmod(
                    F.xxhash64(
                        F.col("query_id"), F.col("doc_id"),
                        F.col("score_r"), F.col("rank"),
                    ),
                    F.lit(1_000_000_007),
                )
            ).alias("s")
        ).first()["s"]

    def run(corpus, queries, broadcast, label, max_df=None):
        out = bm25_topk(
            corpus, queries, k=args.k, broadcast_queries=broadcast,
            max_df=max_df,
        )
        out.count()  # warm plan + scans
        before = _totals(ui, app_id)
        t0 = time.monotonic()
        cs = checksum(out)
        wall = time.monotonic() - t0
        after = _totals(ui, app_id)
        sw = (after["shuffle_write"] - before["shuffle_write"]) / 1e6
        sr = (after["shuffle_read"] - before["shuffle_read"]) / 1e6
        print(
            f"  {label:<34}{wall:>8.2f}s  shufW {sw:>9.2f} MB  "
            f"shufR {sr:>9.2f} MB  checksum {cs}"
        )
        return cs

    for sf in args.sfs.split(","):
        sf_dir = f"/root/testdata/{sf}"
        # the NATURAL corpus: the raw testdata vocabulary is ~44 words,
        # so every doc shares terms with every doc and corpus-as-queries
        # degenerates to all-pairs regardless of join strategy; the
        # Zipf-vocabulary corpus has realistic posting lists, and the
        # max_df cap (the documented stopword-skew knob) bounds the head
        from erpl_web_spark.suite.natural import natural_docs

        docs = natural_docs(spark, sf_dir).select("doc_id", "text")
        n = docs.count()
        cap = max(10, n // 10)
        fixed = (
            docs.orderBy("doc_id")
            .limit(20)
            .selectExpr("doc_id AS query_id", "text AS query_text")
        )
        corpus_q = docs.selectExpr("doc_id AS query_id", "text AS query_text")
        print(f"{sf}: natural corpus {n} docs; k={args.k}; max_df={cap}")
        run(docs, fixed, True, "fixed-20 queries, broadcast", cap)
        run(docs, fixed, False, "fixed-20 queries, shuffle", cap)
        a = run(docs, corpus_q, True, f"corpus-as-queries ({n}), broadcast", cap)
        b = run(docs, corpus_q, False, f"corpus-as-queries ({n}), shuffle", cap)
        assert a == b, "paths diverged — result equality is the contract"
        print("  corpus-as-queries checksums equal across paths")


if __name__ == "__main__":
    main()
