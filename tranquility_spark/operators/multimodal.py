"""Multimodal column conventions (north-star phase 4).

Convention: media payloads ride as opaque ``binary`` columns with a typed
metadata struct alongside (``media_type``, byte size, per-type fields). The
decode / feature-extract step runs as an Arrow-batched ``mapInPandas`` so one
Python worker call processes a whole batch of blobs.

The image/audio codec libraries are not in this container, so ``decode_image``
STUBS the actual pixel decode behind a deterministic fake (documented below);
the Spark-side plumbing — binary schema, UDF signature, batch iteration,
output struct — is real and is what the tests exercise.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, width int, height int, checksum bigint"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build the multimodal convention from the documents table: the utf-8
    bytes of ``text`` stand in for a real media blob."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_image_features(media_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """'Decode' each payload to (width, height, checksum) via mapInPandas.

    STUB: a real implementation would do ``PIL.Image.open(io.BytesIO(b))``
    here; without codec libs we derive deterministic fake dimensions from the
    byte length and a bytewise checksum, keeping the exact plumbing (Arrow
    batches in, struct rows out) a real decoder would use.
    """

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["media_meta"].map(lambda m: m["media_type"]),
                    "n_bytes": n_bytes,
                    # deterministic fake decode (see docstring)
                    "width": n_bytes % 640,
                    "height": (n_bytes * 7) % 480,
                    "checksum": payloads.map(lambda b: sum(b) % 1000000007),
                }
            )

    return media_df.mapInPandas(decode, schema=DECODED_SCHEMA)
