"""Multimodal column support (SURVEY.md §2c).

Images/audio/video are opaque ``binary`` payload columns plus a typed
metadata struct — the same model the reference applies to Kafka values
(raw ``Array[Byte]`` + pluggable decode,
``KafkaUtils.scala:163``/``...InputDStream.scala:50``), generalized to
content-addressed blobs.

The Spark-side plumbing (schema, content addressing, partitioned batch
decode via ``mapInPandas``) is real and tested, and so is the image
codec for the container-friendly formats: :func:`decode_image` is a
dependency-free PPM/PGM (P2/P3/P5/P6) and uncompressed 24/32-bit BMP
decoder (numpy only), with :func:`encode_ppm`/:func:`encode_bmp`
round-trip twins for fixtures.  JPEG/PNG/audio/video codecs are not in
this environment; plugging PIL/cv2/ffmpeg into the same
``decode_image`` dispatch extends coverage without touching any Spark
plumbing.  :func:`image_features` runs the decode end-to-end inside
``mapInPandas`` and emits real per-channel pixel statistics.

Scale: payloads ride the normal columnar path; `mapInPandas` processes
Arrow record batches so a GPU/native decoder sees contiguous buffers;
`spark.sql.files.maxPartitionBytes` bounds per-task bytes; metadata
(width/height/codec) lives in a struct so filters prune without
touching payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: canonical multimodal schema fragment
PAYLOAD_META = (
    "struct<modality:string, fmt:string, n_bytes:bigint, sha256:string>"
)


def attach_payload(
    df: DataFrame, source_col: str, modality: str = "text", fmt: str = "utf-8"
) -> DataFrame:
    """Wrap a column as a content-addressed binary payload + metadata.

    ``sha256`` gives exact-dup detection and stable shard assignment
    for blobs; both are computed JVM-side.
    """
    payload = F.col(source_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(fmt).alias("fmt"),
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def _ppm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` integer header tokens of a netpbm payload (skipping
    ``#`` comments) and the offset one whitespace byte past the last."""
    toks: list[int] = []
    i, ln = 0, len(payload)
    while len(toks) < n:
        while i < ln and payload[i : i + 1].isspace():
            i += 1
        if i < ln and payload[i : i + 1] == b"#":
            while i < ln and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < ln and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        toks.append(int(payload[i:j]))
        i = j
    # Binary netpbm rasters begin exactly one whitespace byte after the
    # maxval token. Verify that byte exists and is whitespace, and
    # refuse "\r" as the terminator: a CRLF-written header ("255\r\n")
    # is byte-indistinguishable from a "\r"-terminated raster whose
    # first pixel is 0x0A, and accepting it would silently shift the
    # raster offset — fail loudly so malformed headers hit the DLQ
    # path instead of producing shifted pixels.
    if i >= ln or not payload[i : i + 1].isspace():
        raise ValueError("netpbm header not terminated by whitespace")
    if payload[i : i + 1] == b"\r":
        raise ValueError("CRLF-terminated netpbm header (ambiguous raster offset)")
    return toks, i + 1  # exactly one whitespace byte after maxval


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to an HxWx3 uint8 numpy array.

    Pure Python + numpy — no codec library.  Formats: netpbm P6/P3
    (PPM) and P5/P2 (PGM, replicated to 3 channels), and uncompressed
    BI_RGB 24/32-bit BMP (bottom-up or top-down, row padding honored).
    Anything else raises ``ValueError`` naming the magic — the dispatch
    point where PIL/cv2 plug in for JPEG/PNG without touching the
    Spark plumbing around it.
    """
    import numpy as np

    if len(payload) < 2:
        raise ValueError("payload too short to be an image")
    magic = payload[:2]
    if magic in (b"P6", b"P5", b"P3", b"P2"):
        toks, off = _ppm_tokens(payload[2:], 3)
        w, h, maxval = toks
        if not (0 < maxval <= 255):
            raise ValueError(f"unsupported netpbm maxval {maxval}")
        ch = 3 if magic in (b"P6", b"P3") else 1
        if magic in (b"P6", b"P5"):
            px = np.frombuffer(payload, np.uint8, count=h * w * ch, offset=2 + off)
        else:  # ascii samples: comment-stripped whitespace-split fields
            body = b"\n".join(
                ln.split(b"#", 1)[0] for ln in payload.split(b"\n")
            ).split()[4:]  # drop magic, w, h, maxval
            px = np.array([int(t) for t in body[: h * w * ch]], dtype=np.uint8)
        arr = px.reshape(h, w, ch)
        return np.repeat(arr, 3, axis=2) if ch == 1 else arr.copy()
    if magic == b"BM":
        import struct

        off, hdr, w, h = struct.unpack_from("<IIii", payload, 10)
        planes, bpp, comp = struct.unpack_from("<HHI", payload, 26)
        if hdr < 40 or comp != 0 or bpp not in (24, 32):
            raise ValueError(f"unsupported BMP (header {hdr}, bpp {bpp}, compression {comp})")
        top_down, h = h < 0, abs(h)
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        rows = np.frombuffer(
            payload, np.uint8, count=h * stride, offset=off
        ).reshape(h, stride)
        bgr = rows[:, : w * nb].reshape(h, w, nb)[:, :, :3]
        rgb = bgr[:, :, ::-1]
        return (rgb if top_down else rgb[::-1]).copy()
    if magic == b"\xff\xd8" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        # compressed-format dispatch: ACTIVE the moment pillow is
        # importable (tests/test_codec_dispatch.py auto-activates with
        # it, the Kafka-jar gate pattern); absent pillow the payload
        # fails loudly into the DLQ path like any unsupported magic.
        try:
            from PIL import Image  # noqa: WPS433 (optional dependency)
        except ImportError as e:
            raise ValueError(
                "JPEG/PNG payload needs pillow (not installed in this "
                "environment); dependency-free formats are netpbm P6/P5/"
                "P3/P2 and uncompressed BMP"
            ) from e
        import io

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8).copy()
    raise ValueError(f"unsupported image format (magic {magic!r}); plug PIL/cv2 here")


def encode_ppm(arr: "object") -> bytes:
    """HxWx3 uint8 array → binary PPM (P6) bytes."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_bmp(arr: "object") -> bytes:
    """HxWx3 uint8 array → uncompressed 24-bit BMP bytes (bottom-up,
    4-byte row padding — the canonical BI_RGB layout)."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray(h * stride)
    bgr = a[:, :, ::-1]
    for r in range(h):
        row = bgr[h - 1 - r].tobytes()
        body[r * stride : r * stride + len(row)] = row
    head = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return head + bytes(body)


def encode_wav(samples: "object", sample_rate: int = 8000) -> bytes:
    """int16 sample array → mono 16-bit PCM RIFF/WAVE bytes.

    Emits the canonical chunk layout (``RIFF`` / ``fmt `` / ``data``)
    plus a ``LIST`` metadata chunk between them, so decoders that
    assume ``data`` starts at byte 44 break — :func:`decode_wav` walks
    chunks properly, as any real-world WAV reader must.
    """
    import struct

    import numpy as np

    a = np.asarray(samples, dtype="<i2")
    body = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    info = b"INFOISFT" + struct.pack("<I", 6) + b"synth\x00"
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(info)) + info
        + b"data" + struct.pack("<I", len(body)) + body
    )
    if len(body) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, "object"]:
    """RIFF/WAVE bytes → (sample_rate, int16 numpy array of samples).

    Dependency-free chunk walker: finds ``fmt `` and ``data`` wherever
    they sit (skipping LIST/INFO/fact/junk chunks, honoring the odd-size
    pad byte).  Mono 16-bit integer PCM only; anything else raises
    ``ValueError`` naming the blocker — the dispatch point where
    soundfile/ffmpeg plug in for float/compressed audio without
    touching the Spark plumbing around it.
    """
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload (magic {payload[:4]!r})")
    pos, end = 12, len(payload)
    rate = channels = bits = codec = None
    data = None
    while pos + 8 <= end:
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            codec, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if codec != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV (codec {codec}, {channels}ch, {bits}-bit); "
            "plug soundfile/ffmpeg here"
        )
    return rate, np.frombuffer(data, dtype="<i2")


def encode_avi(frames: "object", fps: int = 10) -> bytes:
    """List of HxWx3 uint8 RGB frames → real RIFF AVI bytes.

    Emits the canonical chunk layout a real AVI carries: ``RIFF('AVI ')``
    containing ``LIST('hdrl')`` (a 56-byte ``avih`` MainAVIHeader and a
    ``LIST('strl')`` with ``strh``/``strf`` stream headers for an
    uncompressed ``DIB`` video stream), ``LIST('movi')`` with one
    ``00db`` chunk per frame (bottom-up BGR raster, 4-byte row padding
    — the same BI_RGB layout as BMP), and a trailing ``idx1`` index.
    """
    import struct

    import numpy as np

    fl = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = fl[0].shape
    stride = (w * 3 + 3) & ~3
    rasters = []
    for a in fl:
        body = bytearray(h * stride)
        bgr = a[:, :, ::-1]
        for r in range(h):
            row = bgr[h - 1 - r].tobytes()
            body[r * stride : r * stride + len(row)] = row
        rasters.append(bytes(body))
    frame_bytes = h * stride

    avih = struct.pack(
        "<10I", 1_000_000 // fps, frame_bytes * fps, 0, 0x10, len(fl), 0,
        1, frame_bytes, w, h,
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, len(fl), frame_bytes, 10000, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"".join(chunk(b"00db", r) for r in rasters)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame; offsets are relative to the 'movi'
    # fourcc (the common convention)
    idx_entries, off = [], 4
    for r in rasters:
        idx_entries.append(b"00db" + struct.pack("<III", 0x10, off, len(r)))
        off += 8 + len(r) + (len(r) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    payload = hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"AVI " + payload


def _avi_walk(payload: bytes):
    """Yield ``(fourcc, list_type_or_None, body_offset, size)`` for the
    top-level chunks of a RIFF AVI payload."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError(f"not a RIFF/AVI payload (magic {payload[:4]!r})")
    pos, end = 12, len(payload)
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        ltype = payload[pos + 8 : pos + 12] if cid == b"LIST" else None
        yield cid, ltype, pos + 8, size
        pos += 8 + size + (size % 2)


def avi_info(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from the ``avih``/``strf`` headers,
    validating the stream is uncompressed 24-bit ``DIB`` video."""
    import struct

    for cid, ltype, off, size in _avi_walk(payload):
        if cid != b"LIST" or ltype != b"hdrl":
            continue
        pos, end = off + 4, off + size
        w = h = n = None
        while pos + 8 <= end:
            c = payload[pos : pos + 4]
            sz = struct.unpack_from("<I", payload, pos + 4)[0]
            if c == b"avih":
                n, w, h = struct.unpack_from("<I", payload, pos + 8 + 16)[0], *struct.unpack_from("<II", payload, pos + 8 + 32)
            elif c == b"LIST" and payload[pos + 8 : pos + 12] == b"strl":
                spos, send = pos + 12, pos + 8 + sz
                while spos + 8 <= send:
                    sc = payload[spos : spos + 4]
                    ssz = struct.unpack_from("<I", payload, spos + 4)[0]
                    if sc == b"strf":
                        bpp, comp = struct.unpack_from("<H", payload, spos + 8 + 14)[0], struct.unpack_from("<I", payload, spos + 8 + 16)[0]
                        if bpp != 24 or comp != 0:
                            raise ValueError(
                                f"unsupported AVI stream ({bpp}-bit, compression {comp}); plug ffmpeg/cv2 here"
                            )
                    spos += 8 + ssz + (ssz % 2)
            pos += 8 + sz + (sz % 2)
        if None in (w, h, n):
            raise ValueError("AVI hdrl missing avih header")
        return w, h, n
    raise ValueError("AVI missing hdrl list")


def decode_avi_frames(payload: bytes, frame_nos: "object") -> dict:
    """Decode only the requested frames of an uncompressed-DIB AVI.

    Walks the ``movi`` list chunk-by-chunk but materializes a numpy
    raster ONLY for sampled frame numbers — unsampled frames are
    skipped by size, which is the I/O-shape a real frame sampler wants
    (touch a bounded subset of the bytes). Returns
    ``{frame_no: HxWx3 uint8 RGB array}``.
    """
    import struct

    import numpy as np

    w, h, n_frames = avi_info(payload)
    want = {int(f) for f in frame_nos if 0 <= int(f) < n_frames}
    stride = (w * 3 + 3) & ~3
    out = {}
    for cid, ltype, off, size in _avi_walk(payload):
        if cid != b"LIST" or ltype != b"movi":
            continue
        pos, end, frame_no = off + 4, off + size, 0
        while pos + 8 <= end and len(out) < len(want):
            c = payload[pos : pos + 4]
            sz = struct.unpack_from("<I", payload, pos + 4)[0]
            if c in (b"00db", b"00dc"):
                if frame_no in want:
                    if sz < h * stride:
                        raise ValueError(f"truncated AVI frame {frame_no}")
                    rows = np.frombuffer(
                        payload, np.uint8, count=h * stride, offset=pos + 8
                    ).reshape(h, stride)
                    bgr = rows[:, : w * 3].reshape(h, w, 3)
                    out[frame_no] = bgr[::-1, :, ::-1].copy()
                frame_no += 1
            pos += 8 + sz + (sz % 2)
    return out


def video_frame_features(
    df: DataFrame, every_n: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sampled video decode + per-frame pixel statistics.

    For each ``payload`` (uncompressed-DIB AVI bytes) reads the header
    for the frame count, samples frames ``0, every_n, 2·every_n, …``,
    decodes ONLY those rasters (:func:`decode_avi_frames` skips the
    rest by chunk size), and emits one row per sampled frame with
    integer-exact pixel stats — the front-end shape of a video
    curation pipeline (scene filtering, CLIP-scoring frame selection).
    Undecodable payloads yield a single NULL-stats row for the DLQ
    split, same contract as :func:`image_features`.
    """
    schema = (
        f"{id_col} bigint, frame_no int, width int, height int, "
        "sum_px bigint, max_px int, mean_px double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            out = {k: [] for k in ("id", "f", "w", "h", "s", "mx", "mean")}
            for vid, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    b = bytes(payload)
                    w, h, n = avi_info(b)
                    frames = decode_avi_frames(b, range(0, n, every_n))
                    for fno in sorted(frames):
                        a = frames[fno].astype("int64")
                        out["id"].append(vid)
                        out["f"].append(fno)
                        out["w"].append(w)
                        out["h"].append(h)
                        out["s"].append(int(a.sum()))
                        out["mx"].append(int(a.max()))
                        out["mean"].append(float(a.sum()) / a.size)
                except (ValueError, IndexError, struct.error):
                    out["id"].append(vid)
                    for k in ("f", "w", "h", "s", "mx", "mean"):
                        out[k].append(None)
            yield pd.DataFrame(
                {
                    id_col: out["id"],
                    "frame_no": pd.array(out["f"], dtype="Int32"),
                    "width": pd.array(out["w"], dtype="Int32"),
                    "height": pd.array(out["h"], dtype="Int32"),
                    "sum_px": pd.array(out["s"], dtype="Int64"),
                    "max_px": pd.array(out["mx"], dtype="Int32"),
                    "mean_px": pd.array(out["mean"], dtype="float64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, schema=schema)


def audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """End-to-end audio decode + waveform statistics, Arrow-batched.

    For each ``payload`` (WAV bytes) emits n_samples, sample_rate, and
    integer-exact waveform stats: mean amplitude (int64 sample sum /
    n), RMS (int64 sum of squares → sqrt), and peak |amplitude| — the
    shape an audio featurizer (VAD, loudness filter, speech/music
    classifier front-end) takes.  Undecodable payloads yield NULLs for
    the downstream DLQ split, same contract as :func:`image_features`.
    """
    schema = (
        f"{id_col} bigint, n_samples int, sample_rate int, "
        "mean_amp double, rms double, peak int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math
        import struct

        import numpy as np

        for pdf in batches:
            out = {k: [] for k in ("id", "n", "sr", "mean", "rms", "peak")}
            for vid, payload in zip(pdf[id_col], pdf["payload"]):
                out["id"].append(vid)
                try:
                    rate, s = decode_wav(bytes(payload))
                    x = s.astype("int64")
                    n = len(x)
                    out["n"].append(n)
                    out["sr"].append(rate)
                    out["mean"].append(float(x.sum()) / n if n else None)
                    out["rms"].append(
                        math.sqrt(float((x * x).sum()) / n) if n else None
                    )
                    out["peak"].append(int(np.abs(x).max()) if n else None)
                except (ValueError, IndexError, struct.error):
                    for k in ("n", "sr", "mean", "rms", "peak"):
                        out[k].append(None)
            yield pd.DataFrame(
                {
                    id_col: out["id"],
                    "n_samples": pd.array(out["n"], dtype="Int32"),
                    "sample_rate": pd.array(out["sr"], dtype="Int32"),
                    "mean_amp": pd.array(out["mean"], dtype="float64"),
                    "rms": pd.array(out["rms"], dtype="float64"),
                    "peak": pd.array(out["peak"], dtype="Int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, schema=schema)


def audio_window_features(
    df: DataFrame, win: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Windowed waveform features over decoded PCM — the VAD /
    speech-segmentation front-end shape (short-time energy + zero
    crossings per frame), emitted one row per non-overlapping
    ``win``-sample window.  Integer-exact: energy is an int64 sum of
    squares, zero crossings count adjacent sign-product < 0 pairs
    inside the window.  Undecodable payloads yield one NULL-stats row
    (same DLQ contract as :func:`audio_features`).
    """
    schema = (
        f"{id_col} bigint, win_no int, energy bigint, "
        "n_zero_cross int, peak int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            out = {k: [] for k in ("id", "w", "e", "z", "p")}
            for vid, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    _, s = decode_wav(bytes(payload))
                    x = s.astype("int64")
                    n_win = len(x) // win
                    for wno in range(n_win):
                        seg = x[wno * win : (wno + 1) * win]
                        out["id"].append(vid)
                        out["w"].append(wno)
                        out["e"].append(int((seg * seg).sum()))
                        out["z"].append(int((seg[:-1] * seg[1:] < 0).sum()))
                        out["p"].append(int(np.abs(seg).max()))
                except (ValueError, IndexError, struct.error):
                    out["id"].append(vid)
                    for k in ("w", "e", "z", "p"):
                        out[k].append(None)
            yield pd.DataFrame(
                {
                    id_col: out["id"],
                    "win_no": pd.array(out["w"], dtype="Int32"),
                    "energy": pd.array(out["e"], dtype="Int64"),
                    "n_zero_cross": pd.array(out["z"], dtype="Int32"),
                    "peak": pd.array(out["p"], dtype="Int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, schema=schema)


def image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """End-to-end image decode + per-channel statistics, Arrow-batched.

    For each ``payload`` (PPM/PGM/BMP bytes) emits width, height, and
    the real per-channel pixel means — the exact shape a neural
    image encoder integration takes, with the decode step actually
    decoding pixels.  Undecodable payloads yield NULL dimensions (the
    DLQ-style split happens downstream on ``width IS NULL``).
    """
    schema = (
        f"{id_col} bigint, width int, height int, "
        "mean_r double, mean_g double, mean_b double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct  # decode_image's BMP header unpacks raise struct.error

        for pdf in batches:
            out = {k: [] for k in ("id", "w", "h", "r", "g", "b")}
            for vid, payload in zip(pdf[id_col], pdf["payload"]):
                out["id"].append(vid)
                try:
                    arr = decode_image(bytes(payload))
                    m = arr.reshape(-1, 3).mean(axis=0)
                    out["w"].append(arr.shape[1])
                    out["h"].append(arr.shape[0])
                    for k, v in zip("rgb", m):
                        out[k].append(float(v))
                except (ValueError, IndexError, struct.error):
                    for k in ("w", "h", "r", "g", "b"):
                        out[k].append(None)
            yield pd.DataFrame(
                {
                    id_col: out["id"],
                    "width": out["w"],
                    "height": out["h"],
                    "mean_r": out["r"],
                    "mean_g": out["g"],
                    "mean_b": out["b"],
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, schema=schema)


def extract_features(
    df: DataFrame, n_features: int = 8, batch_size_hint: int = 256
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Uses a deterministic fake featurizer (byte histogram moments) in
    place of a neural encoder — the Spark-side contract (mapInPandas
    over payload batches → fixed-width float vector column) is exactly
    what a real model server integration needs.
    """
    out_schema = ", ".join(
        [f.name + " " + f.dataType.simpleString() for f in df.schema.fields]
        + [f"features array<double>"]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                # deterministic fake: moments of byte-value buckets
                row = []
                for i in range(n_features):
                    bucket = b[i::n_features]
                    row.append(
                        (sum(bucket) / len(bucket)) / 255.0 if bucket else 0.0
                    )
                feats.append(row)
            yield pdf.assign(features=feats)

    return df.mapInPandas(featurize, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (blob, frame_no)
    rows for frames ``0, every_n, 2·every_n, …`` based on metadata —
    the decode itself is the stubbed codec. Demonstrates the explode
    pattern that keeps sampling declarative (prunable/pushable)."""
    n_frames = (F.col("meta.n_bytes") / 1000 + 1).cast("int")  # fake: 1 frame/KB
    return df.withColumn(
        "frame_no",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))),
    ).select(id_col, "payload", "meta", "frame_no")
