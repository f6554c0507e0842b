"""jurisprudencia_privada_etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
stjiris/jurisprudencia-privada-etl (an incremental SharePoint-delta →
Elasticsearch document indexer, see /root/reference) as an idiomatic
Spark pipeline:

    changelog tail  →  salted repartition  →  Arrow extraction stage
                    →  last-writer-wins dedup  →  MERGE into lake table
                    →  atomic checkpoint/lineage manifest

The reference's concerns map as (SURVEY.md §2):
  * delta-page tailing + resume tokens  → epoch-pruned changelog scans +
    a checkpointed manifest (sharepoint.ts:400-470)
  * deterministic-UUID upsert           → key-partitioned MERGE with
    last-writer-wins on commit ordinal (juris.ts:6-14)
  * per-document child-process parsing  → vectorized pandas/Arrow batch
    stages, never per-row Python (sharepoint.ts:537-583, pdf_parser.py)
  * post-delta rescan / reintroductions → reconciliation anti-join pass
    (sharepoint.ts:159-193, 344-398)

Everything here is built on the public PySpark 4.x DataFrame API.
"""

__version__ = "0.1.0"

from jurisprudencia_privada_etl_spark.session import get_spark  # noqa: F401
