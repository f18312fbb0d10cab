"""Sources: parquet table loaders and CDC change-event producers.

- ``tables``       driver star-schema / documents / embeddings parquet loaders
- ``cdc_fixture``  the reference's golden 7-event capture as a DataFrame +
                   an identical SQL literal (for DuckDB oracle parity)
- ``changelog``    deterministic synthesis of a CDC change log from the
                   ``orders`` star table — the scale path (runs at any SF)
"""

from scylladb_redpanda_cdc_spark.sources.tables import load_table, register_temp_views

__all__ = ["load_table", "register_temp_views"]
