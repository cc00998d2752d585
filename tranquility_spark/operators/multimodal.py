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


RESIZED_SCHEMA = "doc_id bigint, width int, height int, payload binary"


def resize_images(
    media_df: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize every image payload to (target_width, target_height).

    STUB: a real implementation would decode → ``img.resize(...)`` → re-encode
    per batch. The deterministic fake truncates/tiles the payload to
    ``target_width * target_height`` bytes so output size, schema, and the
    batch shape match a real resizer. The Spark plan is identical either way:
    one narrow mapInPandas, no shuffle, scales linearly with executors.
    """
    n_out = target_width * target_height

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out_payload = pdf["payload"].map(
                lambda b: (b * (n_out // max(len(b), 1) + 1))[:n_out]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": target_width,
                    "height": target_height,
                    "payload": out_payload,
                }
            )

    return media_df.mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_ts_ms int, payload binary"


def sample_frames(
    media_df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample frames from each 'video' payload — a 1→N row fan-out.

    STUB: a real implementation would demux with pyav/ffmpeg per batch. The
    fake treats the payload as ``duration_ms = 100 * n_bytes % 60000`` and
    emits one byte-slice per sampled timestamp. What IS real: the fan-out
    shape (mapInPandas may return more rows than it consumed — this is how
    frame extraction distributes), the typed frame schema, and the bounded
    ``max_frames`` guard that keeps worst-case row amplification explicit.
    """

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "payload": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                duration_ms = (100 * len(payload)) % 60000
                n = min(max(duration_ms // every_ms, 1), max_frames)
                for i in range(int(n)):
                    ts = i * every_ms
                    lo = (ts * 13) % max(len(payload) - 16, 1)
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(ts)
                    rows["payload"].append(payload[lo : lo + 16])
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(frames, schema=FRAMES_SCHEMA)


AUDIO_FRAME_SCHEMA = (
    "doc_id bigint, frame_id bigint, n_samples int, energy bigint, "
    "peak int, is_silence bigint"
)

FRAME = 256
HOP = 128
# mean-square threshold for the silence flag (integer contract:
# energy < SILENCE_MS * n_samples — no float division anywhere)
SILENCE_MS = 1500


def audio_frame_energy(
    media_df: DataFrame,
    id_col: str = "doc_id",
    frame: int = FRAME,
    hop: int = HOP,
    silence_ms: int = SILENCE_MS,
) -> DataFrame:
    """Audio-modality plumbing: frame-level energy / peak / silence flags.

    STUB decode (same contract as ``decode_image_features``): a real
    implementation would PCM-decode the blob here; without codec libs each
    payload byte stands in for an unsigned 8-bit sample centered at 128.
    Everything downstream of the decode — sliding-window framing, per-frame
    sum-of-squares energy, peak deviation, integer silence thresholding —
    is the real DSP shape, Arrow-batched through mapInPandas with a 1→N
    fan-out exactly like ``sample_frames``.

    All arithmetic is INTEGER (sum of squared deviations; the silence test
    multiplies instead of dividing), so the stub path is exactly
    reproducible in a SQL oracle. Full windows only: a payload shorter
    than one frame emits no rows. Scale: no shuffle — each blob frames
    independently; cost is linear in corpus bytes.
    """

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [],
                "frame_id": [],
                "n_samples": [],
                "energy": [],
                "peak": [],
                "is_silence": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                samples = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.int64
                )
                n = len(samples)
                if n < frame:
                    continue
                dev = samples - 128
                for fid in range((n - frame) // hop + 1):
                    w = dev[fid * hop : fid * hop + frame]
                    energy = int(np.dot(w, w))
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(fid)
                    out["n_samples"].append(frame)
                    out["energy"].append(energy)
                    out["peak"].append(int(np.abs(w).max()))
                    out["is_silence"].append(
                        1 if energy < silence_ms * frame else 0
                    )
            yield pd.DataFrame(out)

    return media_df.mapInPandas(frames, schema=AUDIO_FRAME_SCHEMA)
