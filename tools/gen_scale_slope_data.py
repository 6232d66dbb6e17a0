"""Generate an sf1-equivalent (10x sf0.1) corpus for the scale-slope
measurement (VERDICT r5 task #6) — local tool, no driver dependency.

Tiles sf0.1's documents/embeddings 10x with shifted ids. Replicas are
PERTURBED, not byte-copied: texts get a per-replica suffix token (so the
exact-dup collapse cannot trivially erase 90% of the corpus and the
near-dup machinery sees realistic cross-replica near-duplicate cliques —
the crawl-revisit shape), embeddings get one coordinate nudged by a
replica-dependent epsilon. Output: /tmp/sf1eq/{documents,embeddings}.parquet
with 10x the rows and the same schemas.

Usage: python3 tools/gen_scale_slope_data.py [factor] [out_dir]
"""

from __future__ import annotations

import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1eq"
    con = duckdb.connect()
    n_docs = con.sql(
        f"SELECT COUNT(*) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    n_vecs = con.sql(
        f"SELECT COUNT(*) FROM '{SRC}/embeddings.parquet'"
    ).fetchone()[0]
    con.sql(f"""
    COPY (
      SELECT d.doc_id + r.k * {n_docs} AS doc_id,
             CASE WHEN r.k = 0 THEN d.text
                  ELSE d.text || ' rep' || r.k END AS text,
             d.lang, d.source,
             CAST(length(CASE WHEN r.k = 0 THEN d.text
                              ELSE d.text || ' rep' || r.k END)
               AS BIGINT) AS n_chars
      FROM '{SRC}/documents.parquet' d,
           (SELECT UNNEST(range({factor})) AS k) r
      ORDER BY doc_id
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT e.vec_id + r.k * {n_vecs} AS vec_id,
             list_transform(
               e.embedding,
               (v, i) -> CASE WHEN i - 1 = r.k % len(e.embedding)
                              THEN CAST(v + 0.01 * r.k AS FLOAT)
                              ELSE v END
             ) AS embedding,
             e.label
      FROM '{SRC}/embeddings.parquet' e,
           (SELECT UNNEST(range({factor})) AS k) r
      ORDER BY vec_id
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    print(f"wrote {out}: documents={n_docs * factor}, "
          f"embeddings={n_vecs * factor}")


if __name__ == "__main__":
    main()
