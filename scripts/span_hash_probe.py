"""Probe: cost of the span positional-gram hashing stage at sf0.1.

Compares the shipped md5-per-gram scheme against an arithmetic
polynomial (Horner) rolling hash over per-token md5 codes, and a
variant where the Horner chains run over per-token codes computed
WITHOUT md5 (pure char-level fold).  Times the full posgram build +
a count-distinct(gh) materialization, which isolates the hashing
stage from the downstream join.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_wsr_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
W = 8

# Horner chain parameters: three independent (B, M) pairs, all primes,
# M < 2^31 so h*B + c stays far below 2^63 (h < M < 2^31, B < 2^21,
# c < 2^32 -> h*B < 2^52, sum < 2^53).
CHAINS = ((1000003, 2147483647), (999983, 2147483629), (1000033, 2147483587))


def horner(carr: str, base: str, n_chain: int) -> str:
    b, m = CHAINS[n_chain]
    h = f"({carr}[{base}] % {m})"
    for j in range(1, W):
        h = f"(({h} * {b} + {carr}[{base} + {j}]) % {m})"
    return h


def main() -> None:
    spark = get_spark()
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.createOrReplaceTempView("documents")

    current = f"""
WITH sp_tok AS (
  SELECT doc_id, split(trim(text), '\\\\s+') AS t FROM documents
),
sp_h AS (
  SELECT doc_id,
         CASE WHEN size(t) >= {W}
              THEN transform(sequence(0, size(t) - {W}),
                             i -> md5(concat_ws(' ', slice(t, i + 1, {W}))))
              ELSE array() END AS harr
  FROM sp_tok WHERE size(t) >= {W}
),
sp_pg AS (
  SELECT doc_id, pos,
         cast(conv(substr(h, 1, 15), 16, 10) AS bigint) AS gh,
         cast(conv(substr(h, 16, 8), 16, 10) AS bigint) AS vh
  FROM sp_h LATERAL VIEW posexplode(harr) _pe AS pos, h
)
SELECT count(DISTINCT gh) AS n, count(*) AS m, sum(vh) AS s FROM sp_pg
"""

    g1, g2, v1 = horner("c", "i", 0), horner("c", "i", 1), horner("c", "i", 2)
    rolling_md5tok = f"""
WITH sp_tok AS (
  SELECT doc_id, split(trim(text), '\\\\s+') AS t FROM documents
),
sp_c AS (
  SELECT doc_id,
         transform(t, tok -> cast(conv(substr(md5(tok), 1, 8), 16, 10) AS bigint)) AS c
  FROM sp_tok WHERE size(t) >= {W}
),
sp_h AS (
  SELECT doc_id,
         transform(sequence(0, size(c) - {W}),
                   i -> named_struct('gh', {g1} * 2147483648 + {g2},
                                     'vh', {v1})) AS harr
  FROM sp_c
),
sp_pg AS (
  SELECT doc_id, pos, h.gh AS gh, h.vh AS vh
  FROM sp_h LATERAL VIEW posexplode(harr) _pe AS pos, h
)
SELECT count(DISTINCT gh) AS n, count(*) AS m, sum(vh) AS s FROM sp_pg
"""

    for name, sql in (("md5_per_gram", current), ("horner_md5_token", rolling_md5tok)):
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            row = spark.sql(sql).collect()[0]
            times.append(time.monotonic() - t0)
        print(f"{name}: runs={['%.2f' % t for t in times]} "
              f"median={sorted(times)[1]:.2f} distinct_gh={row['n']} rows={row['m']}")


if __name__ == "__main__":
    main()
