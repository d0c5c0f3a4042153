"""Sources: schema-explicit file readers and the chunked REST-style source."""

from redcap_omop_etl_spark.sources.readers import Catalog, load_table, TABLES

__all__ = ["Catalog", "load_table", "TABLES"]
