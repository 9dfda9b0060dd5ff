"""Multimodal column handling: media spans as opaque references with
typed metadata, decode / feature-extract as actor-pool stages.

The docs table interleaves ``kind='media'`` spans (caption +
``media_ref`` URI) with text (BASELINE.json input_hint).  Real decode
libraries (PIL/ffmpeg) are not in this container, so the decode kernel
is STUBBED: ``MediaDecoder(fake=False)`` raises NotImplementedError at
the exact point the library call would happen, and ``fake=True``
substitutes a deterministic fake (bytes + dims derived from the ref
hash).  Everything around the kernel — the schema, the actor-pool
signature, batch sizing for large binary payloads, the output layout —
is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import stable_hash64

MEDIA_META_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("caption", pa.string()),
        ("span_offset", pa.int32()),
    ]
)

DECODED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("payload", pa.binary()),
    ]
)


def extract_media_spans(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Project media spans out of the interleaved docs (vectorized
    explode, media rows only)."""

    def explode(t: pa.Table) -> pa.Table:
        col = t["spans"]
        parent = pc.list_parent_indices(col)
        flat = pc.list_flatten(col)
        kinds = pc.struct_field(flat, "kind")
        mask = pc.equal(kinds, "media")
        doc_ids = pc.take(t["doc_id"], parent).filter(mask)
        return pa.Table.from_arrays(
            [
                doc_ids,
                pc.struct_field(flat, "media_ref").filter(mask),
                pc.struct_field(flat, "text").filter(mask),
                pc.struct_field(flat, "offset").filter(mask),
            ],
            schema=MEDIA_META_SCHEMA,
        )

    return docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


class MediaDecoder:
    """Actor-pool decode stage.  ``__init__`` is where a real codec /
    model would load once per actor; ``__call__`` decodes a batch.
    Keep ``batch_size`` small (binary payloads × concurrency must fit
    worker heap — SURVEY-level guidance for 100 TB media)."""

    def __init__(self, fake: bool = False, max_side: int = 64):
        self.fake = fake
        self.max_side = max_side
        # real path: self.codec = load_image_library()

    def _decode_one(self, media_ref: str) -> tuple:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires an image/audio library not present "
                "in this environment; construct MediaDecoder(fake=True) "
                "for the deterministic stand-in"
            )
        h = stable_hash64("media-decode", media_ref)
        width = 16 + (h % 49)
        height = 16 + ((h >> 8) % 49)
        rng_bytes = (h & 0xFF).to_bytes(1, "big") * min(width * height, 4096)
        return width, height, rng_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, n_bytes, payloads = [], [], [], []
        for ref in batch["media_ref"].to_pylist():
            w, h, data = self._decode_one(ref)
            widths.append(w)
            heights.append(h)
            n_bytes.append(len(data))
            payloads.append(data)
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                batch["media_ref"],
                pa.array(widths, pa.int32()),
                pa.array(heights, pa.int32()),
                pa.array(n_bytes, pa.int64()),
                pa.array(payloads, pa.binary()),
            ],
            schema=DECODED_SCHEMA,
        )


def decode_media(
    docs: ray.data.Dataset,
    fake: bool = True,
    concurrency: int | tuple = (1, 4),
    batch_size: int = 32,
) -> ray.data.Dataset:
    """Full media path: project media spans -> actor-pool decode."""
    media = extract_media_spans(docs)
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def resize_media(decoded: ray.data.Dataset, max_side: int = 32) -> ray.data.Dataset:
    """Aspect-preserving downscale over DECODED_SCHEMA rows.  The
    dimension math is real + vectorized; the pixel resample is where a
    real kernel goes (here: payload truncated to the new byte count —
    deterministic, size-correct)."""

    def resize(t: pa.Table) -> pa.Table:
        w = np.asarray(t["width"].to_pylist(), dtype=np.float64)
        h = np.asarray(t["height"].to_pylist(), dtype=np.float64)
        scale = np.minimum(1.0, max_side / np.maximum(w, h))
        nw = np.maximum(1, np.round(w * scale)).astype(np.int32)
        nh = np.maximum(1, np.round(h * scale)).astype(np.int32)
        payloads = t["payload"].to_pylist()
        out_p = [
            p[: max(1, int(a) * int(b))] for p, a, b in zip(payloads, nw, nh)
        ]
        return pa.Table.from_arrays(
            [
                t["doc_id"],
                t["media_ref"],
                pa.array(nw.tolist(), pa.int32()),
                pa.array(nh.tolist(), pa.int32()),
                pa.array([len(p) for p in out_p], pa.int64()),
                pa.array(out_p, pa.binary()),
            ],
            schema=DECODED_SCHEMA,
        )

    return decoded.map_batches(resize, batch_format="pyarrow")


EMBED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("embedding", pa.list_(pa.float32())),
    ]
)


# Actor pools here autoscale from ONE actor ((1, 4)): chaining two
# fixed-size pools plus read tasks can otherwise starve a small CPU
# budget (observed deadlock at 4 CPUs with 2+2 fixed actors).
class MediaEmbedder:
    """Actor-pool feature extraction: the 'model' (a seeded projection
    matrix) loads ONCE per actor in ``__init__``; ``__call__`` runs
    BATCHED inference — payload byte histograms × projection in one
    matmul per batch (the exact shape a real vision encoder takes:
    swap the histogram for pixel tensors and the matmul for the
    model's forward)."""

    def __init__(self, dim: int = 16, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.proj = rng.standard_normal((256, dim)).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.zeros((batch.num_rows, 256), dtype=np.float64)
        for i, p in enumerate(batch["payload"].to_pylist()):
            if p:
                feats[i] = np.bincount(
                    np.frombuffer(p, dtype=np.uint8), minlength=256
                )
        emb = feats @ self.proj  # one matmul per batch
        norms = np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        emb = (emb / norms).astype(np.float32)
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                batch["media_ref"],
                pa.array([row.tolist() for row in emb], pa.list_(pa.float32())),
            ],
            schema=EMBED_SCHEMA,
        )


def embed_media(
    decoded: ray.data.Dataset,
    dim: int = 16,
    concurrency: int | tuple = (1, 4),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Decoded media -> unit-norm embeddings (actor-pool inference)."""
    return decoded.map_batches(
        MediaEmbedder,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


FRAME_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("frame_idx", pa.int32()),
        ("ts_ms", pa.int64()),
    ]
)


def sample_frames(
    media_meta: ray.data.Dataset, every_ms: int = 1000, fps: int = 25
) -> ray.data.Dataset:
    """Video-style frame sampling plumbing: each media ref's stream
    length is probed (fake: hash-derived duration; real: container
    header read — no full decode), then one row per sampled frame is
    emitted at ``every_ms`` intervals.  Bounded fan-out explode: the
    output row count is duration/every_ms per ref, never a per-frame
    explosion of the whole stream."""

    def explode(t: pa.Table) -> pa.Table:
        doc_ids, refs, idxs, tss = [], [], [], []
        for d, r in zip(t["doc_id"].to_pylist(), t["media_ref"].to_pylist()):
            duration_ms = 500 + stable_hash64("media-duration", r) % 10_000
            for k, ts in enumerate(range(0, duration_ms, every_ms)):
                doc_ids.append(d)
                refs.append(r)
                idxs.append(ts * fps // 1000)
                tss.append(ts)
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, pa.string()),
                pa.array(refs, pa.string()),
                pa.array(idxs, pa.int32()),
                pa.array(tss, pa.int64()),
            ],
            schema=FRAME_SCHEMA,
        )

    return media_meta.map_batches(explode, batch_format="pyarrow")
