"""Multimodal column plumbing (SURVEY §2.J5).

Images/audio/video are opaque ``binary`` payload columns with a typed
metadata struct — parquet stores them natively (BinaryType) and Spark
moves them without interpretation.  The decode / feature-extract step is
the only part that needs a media library: when Pillow is importable,
``image/*`` payloads decode for real; otherwise (this container) a
deterministic STUB stands in (clearly marked) — either way the
Spark-side plumbing (schema, Arrow batch shape, ``mapInPandas``
signature, partition sizing) is real and tested.

Scale notes: media blobs dominate row size, so
``spark.sql.files.maxPartitionBytes`` governs batch memory, and the
``mapInPandas`` iterator form processes one Arrow batch at a time —
bounded memory regardless of corpus size.  Feature extraction is
embarrassingly parallel; no shuffle anywhere in this path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text corpus as multimodal rows: UTF-8 bytes payload +
    metadata struct.  (Real pipelines read media files the same way:
    ``spark.read.format("binaryFile")`` yields path/length/content.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _pil():
    """Import-guarded Pillow handle: the real decoder when the library
    exists, None in containers without it (this one).  Evaluated lazily
    inside the executor-side batch function, so a heterogeneous cluster
    degrades per-worker rather than failing at import."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _decode_media(payload: bytes, mime: str = "text/plain") -> tuple[int, int, list[float]]:
    """Media decoder: real for images when Pillow is importable, else a
    deterministic STUB.

    - ``image/*`` payloads with Pillow present decode for real: true
      width/height and a 4-dim pixel-statistics feature.
    - Everything else (and image payloads without Pillow) takes the
      deterministic fake: pseudo-dimensions from the byte length and a
      4-dim byte-statistics feature vector.  The fixture queries use
      ``text/plain`` payloads, so their oracle-exact outputs are
      identical with or without Pillow installed.
    """
    if mime.startswith("image/"):
        Image = _pil()
        if Image is not None:
            import io  # noqa: PLC0415

            with Image.open(io.BytesIO(payload)) as img:
                gray = img.convert("L")
                px = list(gray.getdata())
                mean = sum(px) / len(px) if px else 0.0
                feature = [
                    float(len(payload)),
                    float(mean),
                    float(px[0]) if px else 0.0,
                    float(px[-1]) if px else 0.0,
                ]
                return img.width, img.height, feature
    n = len(payload)
    width, height = (n % 640) + 1, (n % 480) + 1
    if n:
        head = payload[:256]
        mean = sum(head) / len(head)
        feature = [float(n), float(mean), float(head[0]), float(head[-1])]
    else:
        feature = [0.0, 0.0, 0.0, 0.0]
    return width, height, feature


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract media rows via ``mapInPandas``.

    Arrow-batched: each call receives a pandas batch (vectorized column
    access), not per-row Python calls through pickling.  Output schema is
    declared (FEATURE_SCHEMA) so downstream stays fully typed.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_media(p, m["mime"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(decode_batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize stub over ``mapInPandas`` (real pipelines swap the body for
    PIL/opencv; the Arrow batch shape, declared output schema, and
    binary-payload round trip are the production plumbing).

    STUB semantics: deterministic byte-resampling of the payload to
    width*height bytes (repeat/truncate), so output sizes are exact and
    testable without an image library."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                b = bytes(payload or b"")
                resized = (b * (target // max(len(b), 1) + 1))[:target] if b else bytes(target)
                out.append(resized)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return media.mapInPandas(resize_batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stub: one output row per sampled frame (a real
    decoder emits every k-th video frame; the stub emits fixed-width
    byte windows).  Demonstrates the 1→N row expansion shape — in
    Spark, a ``mapInPandas`` iterator may yield more rows than it
    receives, which is exactly how frame extraction distributes: no
    explode of a pre-materialized frame array, frames stream out of the
    decoder batch by batch."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload or b"")
                for i in range(min(max_frames, max(len(b) // every_n_bytes, 0))):
                    ids.append(doc_id)
                    nos.append(i)
                    frames.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame": frames})

    return media.mapInPandas(frame_batches, FRAMES_SCHEMA)


AUDIO_WINDOWS_SCHEMA = (
    "doc_id long, win_no int, win_start long, win_len long, energy long"
)


def audio_energy_windows(
    media: DataFrame,
    win_bytes: int = 32,
    hop_bytes: int = 16,
    max_windows: int = 16,
) -> DataFrame:
    """Audio framing stub: OVERLAPPING byte windows (hop < window, the
    STFT/VAD framing shape a real PCM pipeline uses) with an exact
    integer energy per window (sum of byte values — the stand-in for
    sum of squared samples; integer so the oracle is engine-exact).

    Complements ``sample_frames`` (non-overlapping 1→N): overlap means
    windows = ceil(n/hop), not n/win, and the last windows may be
    short — both row-count semantics a frame-boundary bug would break.
    Same distribution story: Arrow-batched ``mapInPandas``, windows
    stream out of the decoder iterator, payload bytes never shuffle
    (only doc-keyed window scalars leave the stage)."""

    def window_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, starts, lens, energies = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload or b"")
                n = len(b)
                i = 0
                while i * hop_bytes < n and i < max_windows:
                    w = b[i * hop_bytes : i * hop_bytes + win_bytes]
                    ids.append(doc_id)
                    nos.append(i)
                    starts.append(i * hop_bytes)
                    lens.append(len(w))
                    energies.append(sum(w))
                    i += 1
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "win_no": nos,
                    "win_start": starts,
                    "win_len": lens,
                    "energy": energies,
                }
            )

    return media.mapInPandas(window_batches, AUDIO_WINDOWS_SCHEMA)


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def _dhash_cells(payload: bytes, grid_w: int = 9, grid_h: int = 8) -> list[int]:
    """The 9×8 grayscale grid under the dHash: real downsampled pixels
    when Pillow can decode the payload as an image, else the same
    deterministic byte-resampling STUB the resize/feature operators
    use (nearest-neighbor over the raw bytes).  Either way each cell
    is an int in [0, 255] and a pure function of the payload."""
    n = len(payload)
    cells = grid_w * grid_h
    if n == 0:
        return [0] * cells
    return [payload[(i * n) // cells] for i in range(cells)]


def image_dhash(media: DataFrame, grid_w: int = 9, grid_h: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) per media row via
    ``mapInPandas``: resample to a (grid_w × grid_h) grayscale grid,
    emit one bit per horizontally-adjacent cell pair (left > right) —
    the standard 64-bit perceptual fingerprint under image dedup
    (public algorithm; the grid stub stands in for the PIL resize in
    this container, same contract as extract_features/resize_images).

    Scale shape: Arrow-batched decode, payload bytes never leave the
    stage — only (doc_id, int64) rows do.  At 100 TB the hash computes
    at ingest and persists as a column; everything downstream joins on
    8-byte keys."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for payload in pdf["payload"]:
                cells = _dhash_cells(bytes(payload or b""), grid_w, grid_h)
                h = 0
                for r in range(grid_h):
                    row = cells[r * grid_w : (r + 1) * grid_w]
                    for c in range(grid_w - 1):
                        h = (h << 1) | (1 if row[c] > row[c + 1] else 0)
            # two's-complement into int64 so Spark's LongType holds it
                hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "dhash": hashes})

    return media.mapInPandas(hash_batches, DHASH_SCHEMA)


def dhash_neardup_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Multimodal near-duplicate pairs by perceptual-hash banding — the
    image-dedup analog of the SimHash text family: split the 64-bit
    dHash into ``bands`` equal bit-slices; any pair within Hamming
    distance ``max_hamming`` < ``bands`` shares at least one EXACT
    slice (pigeonhole), so candidates come from an equi-join on
    (band_no, band_bits) and the true distance is verified with
    ``bit_count(a XOR b)`` — never an all-pairs product.

    COMPLETENESS IS CONDITIONAL ON THE CAP (the SymSpell-family
    contract): band buckets above ``max_bucket_size`` members
    (degenerate hashes — uniform padding, black frames) are skipped,
    and a pair whose ONLY matching band is such a bucket is not
    emitted.  Run :func:`oversized_dhash_buckets` with the same
    arguments to observe exactly which buckets (if any) were skipped
    — empty means the result is provably the full hamming-≤-k pair
    set.  At 100 TB this cap is what bounds the join.  Returns
    (doc_a, doc_b, hamming) with doc_a < doc_b, distinct."""
    assert max_hamming < bands, "pigeonhole guarantee requires max_hamming < bands"
    width = 64 // bands
    h = image_dhash(media)
    slices = h.select(
        "doc_id",
        "dhash",
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        f"(dhash >> {i * width}) & {(1 << width) - 1}"
                    ).alias(f"b{i}")
                    for i in range(bands)
                ]
            )
        ).alias("band_no", "band_bits"),
    )
    sizes = slices.groupBy("band_no", "band_bits").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    keyed = slices.join(
        F.broadcast(sizes.filter(F.col("bucket_n") > max_bucket_size)),
        ["band_no", "band_bits"],
        "left_anti",
    )
    a = keyed.select(
        "band_no", "band_bits", F.col("doc_id").alias("doc_a"), F.col("dhash").alias("h_a")
    )
    b = keyed.select(
        "band_no", "band_bits", F.col("doc_id").alias("doc_b"), F.col("dhash").alias("h_b")
    )
    return (
        a.join(b, ["band_no", "band_bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.expr("h_a ^ h_b")).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def oversized_dhash_buckets(
    media: DataFrame,
    bands: int = 4,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Observability companion to :func:`dhash_neardup_pairs`: the
    (band_no, band_bits, bucket_n) rows whose buckets exceeded the cap
    and were therefore skipped.  Empty result == the pair set is
    provably complete for the hamming bound."""
    width = 64 // bands
    h = image_dhash(media)
    slices = h.select(
        F.posexplode(
            F.array(
                *[
                    F.expr(f"(dhash >> {i * width}) & {(1 << width) - 1}")
                    for i in range(bands)
                ]
            )
        ).alias("band_no", "band_bits")
    )
    return (
        slices.groupBy("band_no", "band_bits")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket_size)
    )


def vad_segments(
    windows: DataFrame,
    energy_per_byte: int = 96,
    id_col: str = "doc_id",
) -> DataFrame:
    """Voice-activity-detection segments over framed audio (the
    energy-threshold VAD every speech-data pipeline runs before ASR):
    a window is ACTIVE when its total energy exceeds
    ``energy_per_byte`` per byte (cross-multiplied — no division), and
    maximal runs of consecutive active windows coalesce into segments
    via gaps-and-islands (win_no − row_number is constant within a
    run).  Input is :func:`audio_energy_windows` output; composing the
    two is the decode → frame → segment chain a 100 TB speech corpus
    runs, with the payload bytes never leaving the Arrow-batched frame
    stage — only (id, win_no, energy) longs reach this operator's
    single per-document window sort.

    Returns one row per segment: (id, seg_start byte offset, seg_end
    exclusive, n_windows, total_energy).  Overlapping frames (hop <
    window) make adjacent segments share boundary bytes — seg_end is
    the last active frame's end, the standard VAD convention."""
    active = windows.filter(
        F.col("energy") > F.col("win_len") * F.lit(energy_per_byte)
    )
    w = Window.partitionBy(id_col).orderBy("win_no")
    runs = active.withColumn(
        "island", F.col("win_no") - F.row_number().over(w)
    )
    return runs.groupBy(id_col, "island").agg(
        F.min("win_start").cast("long").alias("seg_start"),
        (F.max(F.col("win_start") + F.col("win_len"))).cast("long").alias("seg_end"),
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.sum("energy").cast("long").alias("total_energy"),
    ).drop("island")


PNG_MAGIC = "89504E470D0A1A0A"
JPEG_MAGIC = "FFD8FF"


def sniff_mime(payload_col: str = "payload") -> F.Column:
    """Container-format detection by magic bytes — the dispatch step a
    multimodal ingest runs BEFORE routing a blob to the right decoder
    (PNG/JPEG by hex signature, GIF by the 'GIF8' ASCII prefix — which
    accepts BOTH the GIF87a and GIF89a variants, everything else
    opaque).  Pure binary substring/hex comparisons, codegen'd,
    scan-side: the payload bytes are inspected where they are read and
    never shuffled for the dispatch decision."""
    c = F.col(payload_col)
    return (
        F.when(F.hex(F.substring(c, 1, 8)) == PNG_MAGIC, F.lit("image/png"))
        .when(F.hex(F.substring(c, 1, 3)) == JPEG_MAGIC, F.lit("image/jpeg"))
        .when(
            F.substring(c, 1, 4) == F.lit("GIF8").cast("binary"),
            F.lit("image/gif"),
        )
        .otherwise(F.lit("application/octet-stream"))
    )


def incremental_media_dedup(
    media: DataFrame,
    n_waves: int = 3,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Incremental MULTIMODAL near-dup dedup, batch twin of
    ``streaming.ingest.run_media_dedup_stream`` (§2.J5 × H — the
    image-dedup analog of the j2m/h15 pairing): media rows arrive in
    ``n_waves`` waves (``wave = doc_id % n_waves``); a row is dropped
    iff its 64-bit perceptual dHash is within Hamming distance
    ``max_hamming`` of an earlier-wave SURVIVOR or of a smaller-id row
    of its own wave.  First-ARRIVED survives.

    Mechanism: one dHash pass + banded pair generation
    (:func:`dhash_neardup_pairs` — pigeonhole-complete under the
    observable bucket cap), then the shared arrival-wave fold
    (``operators.dedup.incremental_wave_fold`` — the exact set algebra
    j2m uses, applied to a hamming pair relation instead of a Jaccard
    one).  Returns ``(doc_id, wave, survived)``."""
    from .dedup import incremental_wave_fold

    pairs = dhash_neardup_pairs(
        media, max_hamming=max_hamming, bands=bands,
        max_bucket_size=max_bucket_size,
    ).select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"))
    docs = media.select(
        "doc_id", (F.col("doc_id") % n_waves).cast("long").alias("wave")
    )
    return incremental_wave_fold(docs, pairs, n_waves)
