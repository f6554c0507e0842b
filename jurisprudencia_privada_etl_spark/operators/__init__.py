"""Relational + CDC operators (SURVEY.md §2)."""

from jurisprudencia_privada_etl_spark.operators.lww import lww_dedup, lww_dedup_agg  # noqa: F401
from jurisprudencia_privada_etl_spark.operators.salting import (  # noqa: F401
    desalt,
    salted_repartition,
)
