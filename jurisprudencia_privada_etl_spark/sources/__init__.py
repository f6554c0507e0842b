"""Sources: synthetic changelog generator and epoch-pruned changelog scans."""

from jurisprudencia_privada_etl_spark.sources.generator import synthetic_changelog  # noqa: F401
from jurisprudencia_privada_etl_spark.sources.changelog import (  # noqa: F401
    read_epoch,
    write_changelog,
)
