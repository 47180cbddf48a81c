"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Image/audio decode libraries are not available in this container, so
the decode step is a clearly-marked deterministic fake
(`_fake_decode`); everything Spark-side — binary column handling,
schema declaration, Arrow batch iteration, partition-preserving
mapInPandas — is real and is what matters at scale: payload bytes stay
in the JVM until the Arrow hand-off, and each task processes its
partition's batches independently (no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, payload_bytes bigint, fake_width int, fake_height int, checksum bigint"
)


def attach_payload(documents: DataFrame) -> DataFrame:
    """Treat document text as an opaque binary payload column — the
    multimodal data model: `binary` payload + typed metadata columns."""
    return documents.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.col("source").alias("media_source"),
    )


_CHK_P = 1_000_000_007
_POW31: list[int] = [1]  # ascending powers of 31 mod _CHK_P, grown on demand


def _pow31_desc(n: int):
    """numpy array of 31^(n-1), …, 31^1, 31^0 (mod p). The scalar
    growth loop runs once per new maximum length and is cached, so the
    per-payload cost is a slice + reverse, not O(len) Python.

    Thread-safe by copy-extend-swap: growth happens on a LOCAL copy of
    the cache and lands via one atomic module-global rebind, so two
    threads racing the extension can at worst duplicate work, never
    interleave appends into a corrupt power table (Spark Python
    workers are single-threaded processes today, but the helper is
    importable from any host code)."""
    import numpy as np

    pows = _POW31
    if len(pows) < n:
        pows = pows.copy()
        while len(pows) < n:
            pows.append((pows[-1] * 31) % _CHK_P)
        globals()["_POW31"] = pows
    return np.array(pows[n - 1 :: -1], dtype=np.int64)


def _poly_checksum(payload: bytes) -> int:
    """Horner fold Σ b_i·31^(n−1−i) mod p as a vectorized numpy
    reduction — bit-identical to the byte loop by the polynomial
    identity; each term < p and int64 holds the sum for any payload
    under ~9 GB, far beyond an Arrow batch row. Shared by the decode
    stand-in and the frame sampler (one checksum definition, one
    oracle formula)."""
    import numpy as np

    n = len(payload)
    if n == 0:
        return 0
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    return int(((arr * _pow31_desc(n)) % _CHK_P).sum() % _CHK_P)


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for an image decode.

    A real deployment plugs Pillow/ffmpeg here:
        raise NotImplementedError("decode requires Pillow/ffmpeg")
    The fake derives metadata purely from the byte content so the
    pipeline is testable end-to-end and oracle-checkable."""
    n = len(payload)
    return n, n % 640, (n * 7) % 480, _poly_checksum(payload)


def decode_payloads(payloads: DataFrame) -> DataFrame:
    """mapInPandas decode over an already-payload-shaped frame
    (doc_id, payload, …) — the entry point for RAW-FILE ingestion via
    `sources.formats.read_binary_dir` as well as the documents-table
    path below. Arrow batches in, decoded metadata rows out; one
    output row per input row, schema declared up front —
    partition-preserving, no shuffle."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload_bytes": [d[0] for d in decoded],
                    "fake_width": [d[1] for d in decoded],
                    "fake_height": [d[2] for d in decoded],
                    "checksum": [d[3] for d in decoded],
                }
            )

    return (
        payloads.select("doc_id", "payload")
        .mapInPandas(decode_batches, DECODED_SCHEMA)
        .orderBy("doc_id")
    )


def decode_metadata(documents: DataFrame) -> DataFrame:
    """Documents-table decode path: text cast to an opaque binary
    payload, then the shared `decode_payloads` mapInPandas pass."""
    return decode_payloads(attach_payload(documents))


EMBED_DIM = 64
EMBED_SCHEMA = "doc_id bigint, embedding array<float>"


def featurize(documents: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Feature extraction: payload → fixed-width embedding, the step
    between decode and the ANN index (`operators.similarity`), closing
    the multimodal → vector-search pipeline.

    A real deployment runs a vision/audio encoder on the Arrow batch
    here (the numpy call becomes `model(batch)`); the stand-in embeds
    each payload's byte histogram projected through a deterministic
    seeded matrix, so the Spark surface — Arrow batch shape, float32
    array column, per-partition batching with no shuffle — is exactly
    the production one. Output vectors are L2-normalized float32, the
    layout `similarity.knn_bruteforce` / `ivf_knn` consume directly
    (integration-tested)."""
    import numpy as np

    payloads = attach_payload(documents)
    rng = np.random.default_rng(20260813)
    proj = rng.standard_normal((256, dim)).astype("float32")

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists = np.zeros((len(pdf), 256), dtype="float32")
            for i, payload in enumerate(pdf["payload"]):
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                if data.size:
                    hists[i] = np.bincount(data, minlength=256).astype("float32")
            vecs = hists @ proj
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            vecs = vecs / norms
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "embedding": list(vecs)}
            )

    return payloads.select("doc_id", "payload").mapInPandas(embed_batches, EMBED_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_no int, frame_offset bigint, frame_checksum bigint"


def sample_frames(documents: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: the 1→N multimodal batch shape (one video
    payload → N sampled frame rows). A real deployment decodes with
    ffmpeg at each offset; the stub slices the payload at N evenly
    spaced offsets and checksums each slice, so row multiplication,
    schema, and Arrow batch handling are exercised for real. Output
    grows N× — at scale, choose N and partition sizes together."""
    payloads = attach_payload(documents)

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "frame_offset": [], "frame_checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                step = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    off = i * step
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_checksum"].append(_poly_checksum(data[off : off + step]))
            yield pd.DataFrame(out)

    return payloads.select("doc_id", "payload").mapInPandas(frame_batches, FRAME_SCHEMA).orderBy(
        "doc_id", "frame_no"
    )


RESIZE_SCHEMA = (
    "doc_id bigint, orig_bytes bigint, stride bigint, "
    "resized_bytes bigint, resized_checksum bigint"
)


def resize_payloads(documents: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize/downsample: payload → stride-sampled payload of
    ≤ target_bytes (every stride-th byte), with the audit metadata a
    pipeline stores next to the thumbnail. A real deployment calls the
    image library's resampler on the Arrow batch; the stand-in's
    stride slice keeps the Spark surface (1→1 mapInPandas, binary in,
    deterministic reduced artifact out) and is oracle-expressible:
    stride = ⌈n/target⌉ in pure integer math, checksum = the shared
    `_poly_checksum` polynomial over the sampled bytes.

    Pure map stage (partition-preserving, no shuffle); at 100 TB the
    resize IS the pipeline's bandwidth reducer — output size is
    bounded by target_bytes per row regardless of input size."""

    payloads = attach_payload(documents)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "orig_bytes": [],
                "stride": [],
                "resized_bytes": [],
                "resized_checksum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n = len(data)
                stride = max(1, (n + target_bytes - 1) // target_bytes)
                resized = data[::stride]
                out["doc_id"].append(doc_id)
                out["orig_bytes"].append(n)
                out["stride"].append(stride)
                out["resized_bytes"].append(len(resized))
                out["resized_checksum"].append(_poly_checksum(resized))
            yield pd.DataFrame(out)

    return (
        payloads.select("doc_id", "payload")
        .mapInPandas(resize_batches, RESIZE_SCHEMA)
        .orderBy("doc_id")
    )


def payload_dedup(documents: DataFrame) -> DataFrame:
    """Exact multimodal dedup by decoded content address: payloads
    grouped on (checksum, byte length) — the binary-column twin of
    `dedup.exact_dedup`, for corpora where the payload is an opaque
    image/audio blob no text normalizer can touch. The keeper is the
    minimum doc_id; n_copies counts the redundant bytes a dedup pass
    reclaims. The (checksum, length) pair is the content address: a
    cross-content collision needs equal length AND equal 31-ary
    polynomial fold mod 1e9+7.

    Scale shape: the decode is the existing Arrow `mapInPandas` pass
    (partition-preserving); dedup is ONE hash groupBy on the
    (checksum, length) key with map-side partials — the exact_dedup
    exchange, nothing more."""
    meta = decode_metadata(documents)
    return (
        meta.groupBy("checksum", "payload_bytes")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
        .select(
            "keeper_doc_id",
            "payload_bytes",
            "checksum",
            "n_copies",
            ((F.col("n_copies") - 1) * F.col("payload_bytes")).alias(
                "reclaimable_bytes"
            ),
        )
        .orderBy("keeper_doc_id")
    )


AUDIO_FRAME_SCHEMA = (
    "doc_id bigint, frame_no int, n_samples int, energy bigint"
)


def audio_frame_energy(
    documents: DataFrame, frame: int = 32, hop: int = 16
) -> DataFrame:
    """Audio framing + per-frame energy — the audio member of the
    multimodal family (next to image decode/resize and video
    frame-sampling): payload bytes are treated as a PCM-8-ish sample
    stream (sample = byte − 100, the deterministic fake decode; a
    real deployment swaps in soundfile/ffmpeg on the same Arrow
    batch), framed with the standard overlapping frame/hop grid, and
    each frame emits its energy Σ sample² — the primitive under VAD,
    silence trimming, and loudness normalization in a speech-data
    pipeline.

    The framing/energy math runs VECTORIZED in numpy on Arrow batches
    (stride-tricked sliding windows — no per-sample Python), and the
    emission is an exact INTEGER, so the whole 1→N surface is
    oracle-checkable with zero float risk. A payload shorter than one
    frame emits no rows (standard framing contract).

    Scale shape: pure 1→N map stage, partition-preserving, no
    shuffle; output rows ≈ bytes/hop. At 100 TB the energy pass is
    scan-bound — exactly the plumbing a real featurizer needs."""
    payloads = attach_payload(documents)

    def energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "n_samples": [], "energy": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(data) < frame:
                    continue
                samples = data.astype(np.int64) - 100
                n_frames = (len(samples) - frame) // hop + 1
                idx = (
                    np.arange(frame)[None, :]
                    + hop * np.arange(n_frames)[:, None]
                )
                energies = np.sum(samples[idx] ** 2, axis=1)
                out["doc_id"].extend([doc_id] * n_frames)
                out["frame_no"].extend(range(n_frames))
                out["n_samples"].extend([frame] * n_frames)
                out["energy"].extend(energies.tolist())
            yield pd.DataFrame(out)

    return (
        payloads.select("doc_id", "payload")
        .mapInPandas(energy_batches, AUDIO_FRAME_SCHEMA)
        .orderBy("doc_id", "frame_no")
    )
