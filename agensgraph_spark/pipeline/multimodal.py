"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata.

Engine extension (no reference-parity item — the reference's nearest
analog is `bytea`): the Spark-native pattern for multimodal corpora is

- payload: ``binary`` column, immutable blob, never interpreted by the
  engine itself;
- metadata: a typed struct column (width/height/channels/sample_rate/
  n_frames/format) that all partitioning, filtering, and planning run
  on — so Catalyst prunes/pushes down on metadata without touching
  payloads;
- decode / feature-extract / resize / frame-sample as Arrow-batched
  ``mapInPandas`` stages — payloads cross the JVM→Python boundary once
  per batch, not once per row.

ALL THREE modalities carry REAL public formats, encoded and decoded by
the pure-numpy codecs below (no codec library required): images are
binary netpbm (P6/PPM — header ``P6\\n{w} {h}\\n255\\n`` + raw
interleaved RGB), audio is RIFF/WAV (PCM 16-bit mono), video is
YUV4MPEG2 (stream header + per-frame ``FRAME\\n`` markers + raw C444
planes). Nothing is a stand-in: every decode kernel parses its
payload's own header and bytes. Compressed formats (png/jpeg) route
through ``decode_real``, which dispatches to PIL when installed and
fails loudly when not — the engine never silently fakes data it
cannot decode.
"""

from __future__ import annotations

import logging
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

log = logging.getLogger(__name__)

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ])),
])


# ---------------------------------------------------------------------------
# netpbm codec — a real public image format, pure numpy

def encode_netpbm(px: np.ndarray) -> bytes:
    """Encode an (h, w, c) uint8 array as binary netpbm: P6 (PPM) for
    c=3, P5 (PGM) for c=1."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError(f"netpbm supports 1 or 3 channels, got {c}")
    magic = b"P6" if c == 3 else b"P5"
    return magic + b"\n" + f"{w} {h}\n".encode() + b"255\n" + \
        np.ascontiguousarray(px, dtype=np.uint8).tobytes()


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Decode binary netpbm (P5/P6, maxval <= 255) to an (h, w, c)
    uint8 array — header parse + frombuffer, no codec library."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload (magic {magic!r})")
    c = 3 if magic == b"P6" else 1
    # header tokens: magic, width, height, maxval — whitespace-separated,
    # '#' comment lines allowed, a single whitespace byte ends the header
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError(f"16-bit netpbm not supported (maxval {maxval})")
    n = w * h * c
    px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return px.reshape(h, w, c)


# ---------------------------------------------------------------------------
# WAV/RIFF codec — a real public audio container (PCM 16-bit), pure numpy

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM samples ((n,) mono or (n, ch)) as a canonical
    RIFF/WAVE file: RIFF header + 'fmt ' chunk (PCM) + 'data' chunk."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    import struct
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate,
                                   sample_rate * ch * 2, ch * 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload (PCM, 16-bit) to ((n, ch) int16
    samples, sample_rate) — chunk-walk header parse + frombuffer, no
    codec library. Fails loudly on non-PCM / non-16-bit encodings."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload (magic {payload[:4]!r})")
    import struct
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("RIFF/WAVE payload missing fmt or data chunk")
    audio_format, ch, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"only PCM 16-bit WAV is supported (format {audio_format}, "
            f"{bits}-bit)")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, ch), sample_rate


# ---------------------------------------------------------------------------
# YUV4MPEG2 (y4m) codec — a real public raw-video container, pure numpy

def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode an (n_frames, h, w, 3) uint8 array as YUV4MPEG2 with
    C444 (full-resolution planes): stream header + per-frame
    ``FRAME\\n`` markers + raw Y, U, V planes. The three channels are
    stored as the three planes verbatim (C444 carries one byte per
    pixel per plane — no subsampling, no colorspace math here)."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) frames, got {frames.shape}")
    n, h, w, _ = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode()]
    planes = np.ascontiguousarray(
        frames.transpose(0, 3, 1, 2), dtype=np.uint8)  # (n, 3, h, w)
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(planes[f].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a YUV4MPEG2 payload (C444) to ((n_frames, h, w, 3)
    uint8, fps) — header token parse + frombuffer per frame, no codec
    library. Fails loudly on subsampled colorspaces (C420 etc.)."""
    if payload[:9] != b"YUV4MPEG2":
        raise ValueError(f"not a YUV4MPEG2 payload (magic {payload[:9]!r})")
    eol = payload.index(b"\n")
    header = payload[:eol].split(b" ")
    w = h = fps = None
    colorspace = b"C420jpeg"  # the format's default when absent
    for tok in header[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            fps = int(tok[1:].split(b":")[0])
        elif tok[:1] == b"C":
            colorspace = tok[1:]
    if w is None or h is None:
        raise ValueError("YUV4MPEG2 header missing W or H")
    if colorspace != b"444":
        raise ValueError(
            f"only C444 (full-res planes) is supported, got C{colorspace.decode()}")
    frame_bytes = 3 * w * h
    # fast path: parameterless FRAME lines make every record exactly
    # (6 + frame_bytes) bytes — one frombuffer + reshape parses the
    # whole stream, with every marker still validated (a stats pass
    # over thousands of clips is 20x faster than a per-frame Python
    # loop); FRAME lines carrying parameters fall back to the loop
    tail = np.frombuffer(payload, dtype=np.uint8, offset=eol + 1)
    rec = 6 + frame_bytes
    marker = np.frombuffer(b"FRAME\n", dtype=np.uint8)
    if tail.size % rec == 0:
        recs = tail.reshape(-1, rec)
        if recs.size == 0 or bool((recs[:, :6] == marker).all()):
            frames = recs[:, 6:].reshape(-1, 3, h, w).transpose(0, 2, 3, 1)
            return frames, (fps or 25)
    frames_list = []
    pos = eol + 1
    while pos < len(payload):
        feol = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        body = payload[feol + 1:feol + 1 + frame_bytes]
        if len(body) != frame_bytes:
            raise ValueError("truncated frame body")
        frames_list.append(np.frombuffer(body, dtype=np.uint8)
                           .reshape(3, h, w).transpose(1, 2, 0))
        pos = feol + 1 + frame_bytes
    return (np.stack(frames_list) if frames_list
            else np.zeros((0, h, w, 3), np.uint8)), (fps or 25)


def decode_real(payload: bytes, fmt: str | None = None) -> np.ndarray:
    """The production decode path: netpbm decodes natively; compressed
    formats dispatch to PIL when installed and fail loudly when not —
    the engine never silently fakes pixels for data it cannot decode."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)
    try:
        import io

        from PIL import Image  # noqa: F401 — optional, gated
    except ImportError as exc:
        raise RuntimeError(
            f"decoding {fmt or 'compressed'} payloads requires PIL, "
            "which this environment does not ship; netpbm (P5/P6) "
            "payloads decode natively") from exc
    return np.asarray(Image.open(io.BytesIO(payload)))


# ---------------------------------------------------------------------------
# synthetic media (test fixture — deterministic and SQL-replayable)

def _image_pixels(mid: int, w: int, h: int) -> np.ndarray:
    """Closed-form RGB pixels for the synthetic corpus: flat index j
    holds (mid*31 + j*7) mod 256 — chosen so a SQL oracle can replay
    any pixel statistic with a generate_series scan."""
    n = w * h * 3
    return ((mid * 31 + 7 * np.arange(n, dtype=np.int64)) % 256) \
        .astype(np.uint8).reshape(h, w, 3)


def _audio_n_samples(mid: int) -> int:
    """Sample count for the synthetic audio corpus (a multiple of the
    256-sample tile period, so the column-expression encoder repeats a
    fixed tile)."""
    return 2048 + (mid % 8) * 512


def _audio_samples(mid: int, n: int) -> np.ndarray:
    """Closed-form int16 PCM samples: sample j holds the signed
    reinterpretation of (mid*37 + j*256) mod 65536 — stepping by 256
    makes the little-endian byte pair (const, (base+j) mod 256), so the
    encoder can tile it JVM-side, and a SQL oracle can replay any
    sample statistic with a generate_series scan."""
    v = (mid * 37 + 256 * np.arange(n, dtype=np.int64)) % 65536
    return np.where(v >= 32768, v - 65536, v).astype(np.int16)


def _video_dims(mid: int) -> tuple[int, int, int]:
    """(n_frames, height, width) for the synthetic video corpus."""
    return mid % 24 + 1, 12 + (mid % 3) * 4, 16 + (mid % 4) * 4


def _video_frames(mid: int, nf: int, h: int, w: int) -> np.ndarray:
    """Closed-form video pixels: byte t of frame f's plane body (Y
    then U then V, C444) holds (mid*29 + f*17 + 3t) mod 256 — period
    256 in t, so the encoder tiles one 256-byte run per frame and a
    SQL oracle replays any pixel statistic with a generate_series
    scan over (f, t)."""
    f = np.arange(nf, dtype=np.int64)[:, None]
    t = np.arange(3 * h * w, dtype=np.int64)[None, :]
    body = ((mid * 29 + f * 17 + 3 * t) % 256).astype(np.uint8)
    return body.reshape(nf, 3, h, w).transpose(0, 2, 3, 1)


def synthesize_media(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", spread: bool = True) -> DataFrame:
    """Derive a deterministic media table from the documents table
    (the container ships no real binaries). Image payloads are REAL
    netpbm/P6 encodings of closed-form pixels (``_image_pixels``);
    audio/video payloads are the utf-8 text bytes. All metadata follows
    closed-form expressions of the id so SQL oracles can replay every
    metadata-level operator, and the pixel formula lets them replay
    image statistics too.

    The encodes are PURE COLUMN EXPRESSIONS (no Python): because
    gcd(7, 256) = 1, the pixel sequence (mid*31 + 7j) mod 256 has
    period exactly 256, so the image body is one hex-encoded 256-byte
    tile repeated w*h*3/256 times and unhexed once; the audio samples
    step by 256, so the little-endian int16 pair is (const byte,
    (base+j) mod 256) — again a 256-sample tile. Keeping it JVM-side
    means Catalyst PRUNES the payload away for metadata-only consumers
    (frame sampling, meta scans) — at 100 TB the payload bytes are
    only materialized by operators that decode them."""
    # spread=True (the default, right for payload consumers): exchange
    # the (payload-free, tiny) doc rows BEFORE construction — the
    # payload expressions are CPU-bound and land below any later
    # exchange (a repartition of the constructed frame sits ABOVE the
    # projection), so without this they run on the scan's split count
    # (a single-file corpus = one core; measured 4.8s -> ~1s for the
    # video-stats pass at sf0.1). Metadata-only consumers (frame
    # sampling, meta scans) pass spread=False to keep the bare scan:
    # column pruning already drops the payload expressions for them,
    # and the exchange would be pure overhead.
    if spread:
        docs = docs.repartition(
            docs.sparkSession.sparkContext.defaultParallelism)
    i = F.col(id_col).cast("long")
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (i % 3 + 1).cast("int"))
    w = (F.lit(64) + (i % 8) * 16).cast("int")
    h = (F.lit(48) + (i % 6) * 16).cast("int")

    # netpbm P6 header + tiled pixel body, all column expressions
    header = F.concat(F.lit("P6\n"), w.cast("string"), F.lit(" "),
                      h.cast("string"), F.lit("\n255\n")).cast("binary")
    tile_hex = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(255)),
                    lambda j: F.lpad(F.hex((i * 31 + 7 * j) % 256), 2, "0")),
        "")
    n = (w * h * 3).cast("long")
    body_hex = F.substring(F.repeat(tile_hex, ((n + 255) / 256).cast("int")),
                           1, (n * 2).cast("int"))
    image_payload = F.concat(header, F.unhex(body_hex))

    # RIFF/WAVE header (PCM mono 16-bit @ 16 kHz) + tiled sample body.
    # Sample j = signed((mid*37 + 256j) mod 65536): LE bytes are
    # (mid*37 mod 256, (mid*37 div 256 + j) mod 256) — a 256-sample tile.
    def le_hex(col, nbytes):  # little-endian fixed-width hex of a long
        return F.concat(*[
            F.lpad(F.hex((col / (256 ** b)).cast("long") % 256), 2, "0")
            for b in range(nbytes)])

    n_samp = (F.lit(2048) + (i % 8) * 512).cast("long")
    ds = n_samp * 2
    b0_hex = F.lpad(F.hex((i * 37) % 256), 2, "0")
    c1 = ((i * 37) / 256).cast("long")
    audio_tile_hex = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(255)),
                    lambda j: F.concat(b0_hex,
                                       F.lpad(F.hex((c1 + j) % 256), 2, "0"))),
        "")
    audio_body_hex = F.substring(
        F.repeat(audio_tile_hex, ((n_samp + 255) / 256).cast("int")),
        1, (ds * 2).cast("int"))
    # constants: "WAVE" "fmt " size=16 fmt=PCM ch=1 rate=16000
    # byte_rate=32000 align=2 bits=16, then "data"
    audio_hdr_hex = F.concat(
        F.lit("52494646"), le_hex(ds + 36, 4),                   # "RIFF" size
        F.lit("57415645666D74201000000001000100803E0000007D000002001000"),
        F.lit("64617461"), le_hex(ds, 4))                        # "data" size
    audio_payload = F.unhex(F.concat(audio_hdr_hex, audio_body_hex))

    # YUV4MPEG2 header + per-frame "FRAME\n" markers + tiled C444
    # plane bodies. Frame f's byte t holds (mid*29 + f*17 + 3t) mod 256.
    # Because gcd(3, 256) = 1, frame f's 256-byte tile is frame 0's tile
    # ROTATED by d_f = 17·f·3⁻¹ mod 256 (3⁻¹ = 171), so the encoder
    # builds ONE doubled base tile per doc and each frame is a
    # substring of it — no per-frame 256-element transform (which made
    # video synthesis ~5x the cost of the other modalities).
    nf = (i % 24 + 1).cast("int")
    wv = (F.lit(16) + (i % 4) * 4).cast("int")
    hv = (F.lit(12) + (i % 3) * 4).cast("int")
    fbytes = (wv * hv * 3).cast("long")
    video_header = F.concat(
        F.lit("YUV4MPEG2 W"), wv.cast("string"), F.lit(" H"),
        hv.cast("string"), F.lit(" F25:1 Ip A1:1 C444\n")).cast("binary")
    vtile0 = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(255)),
                    lambda j: F.lpad(F.hex((i * 29 + 3 * j) % 256), 2, "0")),
        "")
    vtile2 = F.concat(vtile0, vtile0)  # doubled: rotations are substrings

    def frame_hex(f):
        d = (f * 17 * 171) % 256
        tile = F.substring(vtile2, (d * 2 + 1).cast("int"), 512)
        body = F.substring(F.repeat(tile, ((fbytes + 255) / 256).cast("int")),
                           1, (fbytes * 2).cast("int"))
        return F.concat(F.lit("4652414D450A"), body)  # "FRAME\n" + planes

    video_body_hex = F.array_join(
        F.transform(F.sequence(F.lit(0), nf - 1), frame_hex), "")
    video_payload = F.concat(video_header, F.unhex(video_body_hex))

    return docs.select(
        i.alias("media_id"),
        kind.alias("kind"),
        F.when(kind == "image", image_payload)
         .when(kind == "audio", audio_payload)
         .otherwise(video_payload).alias("payload"),
        F.struct(
            F.when(kind == "video", wv).otherwise(w).alias("width"),
            F.when(kind == "video", hv).otherwise(h).alias("height"),
            F.when(kind == "audio", 1).otherwise(3).cast("int").alias("channels"),
            F.when(kind == "audio", 16000).otherwise(0).cast("int").alias("sample_rate"),
            F.when(kind == "video", nf)
             .when(kind == "audio", n_samp)
             .otherwise(1).cast("int").alias("n_frames"),
            F.element_at(F.array(F.lit("ppm"), F.lit("wav"), F.lit("y4m")), (i % 3 + 1).cast("int"))
             .alias("format"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# operators


_SPREAD_SAFE_NODES = frozenset({
    "Project", "Filter", "LogicalRelation", "LogicalRDD",
    "SubqueryAlias", "GlobalLimit", "LocalLimit", "View", "Sample"})


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin the rows across the session's parallelism before an
    Arrow decode stage: the decode kernels are CPU-bound and must not
    inherit the scan's split count (a single-file local corpus
    otherwise runs every decode on ONE core).

    Skip detection works WITHOUT ``df.rdd``: under AQE that probe
    eagerly executes upstream shuffle stages at plan-construction time
    (AdaptiveSparkPlanExec materializes query stages), so a
    spread=True synthesized frame would run its round-robin map job
    once for the probe and again for the real action. Instead the
    ANALYZED logical plan (no execution) decides:

    - a round-robin ``Repartition n, true`` node with n >= parallelism
      below us (synthesize_media's own spread) is balanced by
      construction — skip;
    - a SHUFFLE-FREE frame (pure scan/filter/projection nodes only) is
      safe to probe for its partition count — ``df.rdd`` then costs a
      file listing, not a stage execution — so a wide 100 TB scan with
      thousands of splits keeps its natural parallelism. Caveat
      (documented, accepted): partition COUNT does not imply balance —
      a highly selective filter over a clustered corpus can leave many
      near-empty splits and the skip then under-parallelizes the
      decode; callers with that shape should repartition explicitly.
      Parquet splits are size-bounded, so the imbalance is bounded by
      the filter's selectivity skew, not unbounded;
    - anything else (joins/aggregates below, streaming relations, an
      un-stringifiable plan) keeps the exchange."""
    spread = df.sparkSession.sparkContext.defaultParallelism
    try:
        root = df._jdf.queryExecution().analyzed()

        def _rr_path(node) -> "list | None":
            """Root path to the first round-robin Repartition with
            numPartitions >= parallelism, or None."""
            if (node.nodeName() == "Repartition" and node.shuffle()
                    and node.numPartitions() >= spread):
                return [node]
            ch = node.children()
            for i in range(ch.length()):
                p = _rr_path(ch.apply(i))
                if p is not None:
                    return [node] + p
            return None

        def _names(node, acc: set) -> set:
            acc.add(node.nodeName())
            ch = node.children()
            for i in range(ch.length()):
                _names(ch.apply(i), acc)
            return acc

        path = _rr_path(root)
        if path is not None and all(
                n.nodeName() in _SPREAD_SAFE_NODES for n in path[:-1]):
            # the round-robin spread still governs the output layout:
            # everything above it is narrow
            return df
        if _names(root, set()) <= _SPREAD_SAFE_NODES:
            # shuffle-free frame (pure scan/projection): the partition
            # count probe costs a file listing, not a stage execution
            if df.rdd.getNumPartitions() >= spread:
                return df
    except Exception as exc:
        # un-introspectable plan (e.g. streaming) — keep the exchange.
        # Logged: this walk uses private Py4J internals (queryExecution,
        # node.shuffle()), so a Spark minor-version rename would land
        # here and silently re-pay the exchange for already-spread
        # frames; a debug line makes that perf regression diagnosable
        log.debug("_spread: plan walk failed (%s: %s) — keeping the "
                  "round-robin exchange", type(exc).__name__, exc)
    return df.repartition(spread)

IMAGE_STATS_SCHEMA = (
    "media_id long, n_pixels long, mean_value double, std_value double, min_value int, max_value int"
)


def image_stats(media: DataFrame) -> DataFrame:
    """Decode each image payload (REAL netpbm decode — header parse +
    frombuffer, nothing taken from metadata) and emit per-image pixel
    statistics. Arrow-batched mapInPandas: one Python roundtrip per
    batch of payloads."""
    imgs = _spread(media.filter(F.col("kind") == "image").select("media_id", "payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_netpbm(bytes(r.payload))
                rows.append((r.media_id, int(px.size), float(px.mean()),
                             float(px.std()), int(px.min()), int(px.max())))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_pixels", "mean_value", "std_value", "min_value", "max_value"])

    return imgs.mapInPandas(batches, schema=IMAGE_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "media_id long, n_samples long, sample_rate long, mean_value double, "
    "min_value long, max_value long"
)


def audio_stats(media: DataFrame) -> DataFrame:
    """Decode each audio payload (REAL RIFF/WAV PCM parse — chunk walk
    + frombuffer, nothing taken from metadata) and emit per-clip sample
    statistics. Arrow-batched mapInPandas, one Python roundtrip per
    batch of payloads — the same shape as image_stats."""
    clips = _spread(media.filter(F.col("kind") == "audio").select("media_id", "payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                samples, rate = decode_wav(bytes(r.payload))
                s = samples.astype(np.int64)
                rows.append((r.media_id, int(s.size), int(rate),
                             float(s.mean()), int(s.min()), int(s.max())))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_samples", "sample_rate", "mean_value",
                "min_value", "max_value"])

    return clips.mapInPandas(batches, schema=AUDIO_STATS_SCHEMA)


VIDEO_STATS_SCHEMA = (
    "media_id long, n_frames long, frame_h long, frame_w long, "
    "mean_value double, min_value long, max_value long"
)


def video_stats(media: DataFrame) -> DataFrame:
    """Decode each video payload (REAL YUV4MPEG2 parse — header
    tokens, FRAME markers, frombuffer per plane body; nothing taken
    from metadata) and emit per-video pixel statistics over all
    frames/planes. Arrow-batched mapInPandas."""
    vids = _spread(media.filter(F.col("kind") == "video").select("media_id", "payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                frames, _fps = decode_y4m(bytes(r.payload))
                px = frames.astype(np.int64)
                rows.append((r.media_id, frames.shape[0], frames.shape[1],
                             frames.shape[2], float(px.mean()),
                             int(px.min()), int(px.max())))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_frames", "frame_h", "frame_w",
                "mean_value", "min_value", "max_value"])

    return vids.mapInPandas(batches, schema=VIDEO_STATS_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize: decode (netpbm) → nearest-neighbor resample → re-encode
    as netpbm, so the output payload is itself decodable; metadata is
    rewritten to match."""
    imgs = _spread(media.filter(F.col("kind") == "image"))
    schema = MEDIA_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                px = decode_netpbm(bytes(r.payload))
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                resized = px[yi][:, xi]
                meta = dict(r.meta)
                meta.update(width=out_w, height=out_h, format="ppm")
                out.append((r.media_id, r.kind, encode_netpbm(resized), meta))
            yield pd.DataFrame(out, columns=["media_id", "kind", "payload", "meta"])

    return imgs.mapInPandas(batches, schema=schema)


def frame_index(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling plan for video payloads: explode sampled frame
    indices 0, n, 2n, ... JVM-side (no Python) — the per-frame decode
    is a downstream mapInPandas over (media_id, frame_no) batches."""
    vids = media.filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
    return vids.select("media_id", F.explode(idx).alias("frame_no"),
                       F.col("meta.n_frames").alias("n_frames"))


FEATURE_SCHEMA = "media_id long, feature array<double>"


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction: decode → pooled feature vector per payload,
    every value normalized into [0, 1]. ALL THREE modalities decode for
    real: images (netpbm) pool mean intensity per flat chunk; audio
    (RIFF/WAV PCM) pools mean amplitude per chunk (int16 shifted to
    unsigned / 65535); video (YUV4MPEG2) pools mean plane value across
    all frames. Unknown payload formats raise — the engine never
    silently fakes features for data it cannot decode. Batch-shaped
    like a real vision-encoder inference stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                pay = bytes(r.payload)
                if pay[:2] in (b"P5", b"P6"):
                    flat = decode_netpbm(pay).astype(np.float64).ravel()
                    scale = 255.0
                elif pay[:4] == b"RIFF":
                    samples, _rate = decode_wav(pay)
                    flat = samples.astype(np.float64).ravel() + 32768.0
                    scale = 65535.0
                elif pay[:9] == b"YUV4MPEG2":
                    frames, _fps = decode_y4m(pay)
                    flat = frames.astype(np.float64).ravel()
                    scale = 255.0
                else:
                    raise ValueError(
                        f"unknown payload format (magic {pay[:9]!r}); "
                        "supported: netpbm P5/P6, RIFF/WAV PCM, YUV4MPEG2")
                vec = [float(chunk.mean()) / scale
                       for chunk in np.array_split(flat, dim)]
                rows.append((r.media_id, vec))
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return _spread(media.select("media_id", "payload")).mapInPandas(batches, schema=FEATURE_SCHEMA)
