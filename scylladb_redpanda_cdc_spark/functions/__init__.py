"""Public scalar-function library (SURVEY.md §2.F/§2.X kernels).

Re-exports the engine's Column-level building blocks so users compose them
like `pyspark.sql.functions`:

    from scylladb_redpanda_cdc_spark import functions as EF
    df.select(EF.cosine(df.a, df.b), EF.words(df.text))

All are pure JVM-side expression algebra (whole-stage codegen; no Python
UDFs) unless documented otherwise.
"""

from scylladb_redpanda_cdc_spark.operators.cdc import (
    cell_touched,
    cell_value,
    derive_topic_name,
    op_kind,
)
from scylladb_redpanda_cdc_spark.operators.llm import (
    MINHASH_BANDS,
    STOPWORDS,
    connected_components_min_label,
    cosine,
    dot_d,
    hash16,
    hash60,
    l2_norm,
    lsh_bucket,
    lsh_plane_ints,
    minhash_band_signature,
    minhash_remix,
    rolling_fingerprint,
    shingle_hashes,
    simhash16,
    word_grams,
    word_shingles,
    words,
)
from scylladb_redpanda_cdc_spark.operators.multimodal import (
    frame_sample_indices,
    media_struct,
)

__all__ = [
    "MINHASH_BANDS",
    "STOPWORDS",
    "cell_touched",
    "cell_value",
    "connected_components_min_label",
    "cosine",
    "derive_topic_name",
    "dot_d",
    "frame_sample_indices",
    "hash16",
    "hash60",
    "l2_norm",
    "lsh_bucket",
    "lsh_plane_ints",
    "media_struct",
    "minhash_band_signature",
    "minhash_remix",
    "op_kind",
    "rolling_fingerprint",
    "shingle_hashes",
    "simhash16",
    "word_grams",
    "word_shingles",
    "words",
]
