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
    concurrency: int | tuple = 2,
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
