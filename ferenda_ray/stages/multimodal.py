"""Multimodal column stages — image/audio payloads as opaque ``binary``
columns with typed metadata (task brief: make the Ray-side plumbing —
schema, batch sizing, actor signature, output layout — real; STUB the
codec since no image/audio libraries exist in this environment).

Pattern mirrors the reference's external-tool readers (PDFReader /
WordReader shell out to pdftohtml/antiword once per worker,
``pdfreader.py:32-1180``, ``wordreader.py:23-218``): a stateful actor
pool whose ``__init__`` would load the codec/model, ``__call__``
decodes a batch. Here the "codec" is a deterministic fake
(``FakeCodec``) unless a real backend import succeeds.

Scale notes: media rows are WIDE — run these stages with small
``batch_size`` (16-64) and a conservative ``target_max_block_size``;
drop the payload column immediately after feature extraction
(``select_columns``), exactly like the html column in extract.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("url", pa.string()),
        ("kind", pa.string()),        # "image" | "audio" | "video"
        ("content_type", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),        # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


class FakeCodec:
    """Deterministic stand-in for a real image/audio decoder: 'decodes'
    payload bytes to a stable feature vector + pseudo dimensions. A real
    backend (PIL / torchaudio / ffmpeg) slots in behind the same two
    methods."""

    def decode_meta(self, payload: bytes, kind: str) -> tuple[int, int, int]:
        h = hashlib.sha1(payload).digest()
        if kind == "image":
            return 64 + h[0] % 192, 64 + h[1] % 192, -1
        return -1, -1, 1000 + int.from_bytes(h[:2], "little") % 60000

    def features(self, payload: bytes) -> np.ndarray:
        h = hashlib.sha1(payload).digest()
        raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                            dtype=np.uint32).astype(np.float64)
        v = raw / np.linalg.norm(raw)
        return v.astype(np.float32)


def _real_backend_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


class MediaDecodeStage:
    """Actor-pool stage: media batch → metadata + feature columns, payload
    DROPPED from the output. ``__init__`` loads the codec once per actor.

    Usage::

        ds.map_batches(MediaDecodeStage, batch_format="pyarrow",
                       batch_size=32, concurrency=(2, 8), num_cpus=1)
    """

    def __init__(self, strict_real_backend: bool = False):
        if strict_real_backend and not _real_backend_available():
            raise NotImplementedError(
                "no image/audio codec available in this environment; "
                "install PIL/ffmpeg or use the FakeCodec default"
            )
        self.codec = FakeCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        w, h, d, feats, ok = [], [], [], [], []
        for kind, payload in zip(kinds, payloads):
            try:
                wi, hi, di = self.codec.decode_meta(payload, kind)
                fv = self.codec.features(payload)
                w.append(wi); h.append(hi); d.append(di)
                feats.append(fv.tolist()); ok.append(True)
            except Exception:
                w.append(-1); h.append(-1); d.append(-1)
                feats.append([0.0] * FEATURE_DIM); ok.append(False)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "url": batch.column("url"),
                "kind": batch.column("kind"),
                "width": pa.array(w, pa.int32()),
                "height": pa.array(h, pa.int32()),
                "duration_ms": pa.array(d, pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float32())),
                "decode_ok": pa.array(ok, pa.bool_()),
            }
        )


class MediaResizeStage:
    """Actor-pool stage: image payloads → resized payloads + updated
    dims (payload KEPT — this is a transform stage feeding further
    decode/training steps, unlike the feature stage which drops it).
    The resample itself is stubbed (no PIL here): output payload is a
    deterministic function of (input payload, target box), tagged with
    the real letterbox-fit geometry math a real backend would use."""

    def __init__(self, max_w: int = 256, max_h: int = 256):
        self.max_w, self.max_h = max_w, max_h
        self.codec = FakeCodec()

    def _fit(self, w: int, h: int) -> tuple[int, int]:
        scale = min(self.max_w / max(w, 1), self.max_h / max(h, 1), 1.0)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_p, out_w, out_h = [], [], []
        for kind, payload in zip(kinds, payloads):
            if kind != "image":
                out_p.append(payload); out_w.append(-1); out_h.append(-1)
                continue
            w, h, _ = self.codec.decode_meta(payload, kind)
            nw, nh = self._fit(w, h)
            # stub resample: real backend replaces just this line
            resized = hashlib.sha1(
                payload + f"{nw}x{nh}".encode()).digest() * 4
            out_p.append(bytes(resized)); out_w.append(nw); out_h.append(nh)
        out = batch.drop_columns(["payload", "width", "height"])
        out = out.append_column("payload", pa.array(out_p, pa.binary()))
        out = out.append_column("width", pa.array(out_w, pa.int32()))
        return out.append_column("height", pa.array(out_h, pa.int32()))


class FrameSampleStage:
    """flat_map-shaped actor stage: one video row → N sampled frame
    rows (media_id, frame_idx, ts_ms, features). Non-video rows pass
    through as a single frame_idx=-1 row. Frame decode is stubbed; the
    sampling geometry (uniform over duration) is real."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames
        self.codec = FakeCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_o, idx_o, ts_o, feat_o = [], [], [], []
        for mid, kind, payload in zip(batch.column("media_id").to_pylist(),
                                      batch.column("kind").to_pylist(),
                                      batch.column("payload").to_pylist()):
            if kind != "video":
                ids_o.append(mid); idx_o.append(-1); ts_o.append(-1)
                feat_o.append(self.codec.features(payload).tolist())
                continue
            _, _, dur = self.codec.decode_meta(payload, "video")
            for k in range(self.n_frames):
                ts = int((k + 0.5) * dur / self.n_frames)
                ids_o.append(mid); idx_o.append(k); ts_o.append(ts)
                feat_o.append(
                    self.codec.features(payload + ts.to_bytes(4, "little"))
                    .tolist())
        return pa.table({
            "media_id": pa.array(ids_o, pa.string()),
            "frame_idx": pa.array(idx_o, pa.int32()),
            "ts_ms": pa.array(ts_o, pa.int32()),
            "features": pa.array(feat_o, pa.list_(pa.float32())),
        })


def synthetic_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media rows for tests/bench (payload = seeded bytes)."""
    import random

    rows = {k: [] for k in ("media_id", "url", "kind", "content_type",
                            "payload", "width", "height", "duration_ms")}
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = random.Random(f"{seed}:media:{i}")
        kind = kinds[i % 3]
        rows["media_id"].append(f"m{i:06d}")
        rows["url"].append(f"https://www.site{i % 20:03d}.example.org/media/{i}")
        rows["kind"].append(kind)
        rows["content_type"].append(
            {"image": "image/jpeg", "audio": "audio/ogg",
             "video": "video/mp4"}[kind]
        )
        rows["payload"].append(rng.randbytes(128 + rng.randint(0, 512)))
        rows["width"].append(-1)
        rows["height"].append(-1)
        rows["duration_ms"].append(-1)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.string()),
            "url": pa.array(rows["url"], pa.string()),
            "kind": pa.array(rows["kind"], pa.string()),
            "content_type": pa.array(rows["content_type"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
        }
    )
