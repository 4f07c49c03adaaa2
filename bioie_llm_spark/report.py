"""Cross-model report composition (VERDICT r1 missing #5).

The reference composes a side-by-side comparison of N models' result files
(/root/reference/src/result_comparer.py:105-128 — per-model scores, the
all-model intersection, per-model unique answers, consensus correctness)
and renders a confusion-matrix heatmap PNG
(/root/reference/src/evaluators/evaluator.py:135-159). The engine's
underlying aggregates all exist as operators (metrics.classification_metrics,
metrics.consensus, the A7/A8 set algebra); this module is the report
ASSEMBLY layer: everything stays a DataFrame until the final bounded
render, so composing a report over a 100 TB result lake is the same code
as over a unit-test frame.

The heatmap renders two ways, neither needing matplotlib: alignment-padded
text (render_confusion) and a real PNG via a stdlib-only encoder
(confusion_png — zlib + struct); the pivot frame also feeds any external
plotting layer directly.
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.metrics import classification_metrics, consensus


def _tag(results: dict[str, DataFrame]) -> DataFrame:
    out = None
    for model, df in sorted(results.items()):
        tagged = df.select(
            F.lit(model).alias("model"), "src", "pred", "true"
        )
        out = tagged if out is None else out.unionByName(tagged)
    return out


def model_comparison(results: dict[str, DataFrame]) -> DataFrame:
    """results: model -> (src, pred, true) frame. Returns one row per model:
    scores + cross-model set stats (result_comparer.py:105-128 semantics):

    - n / accuracy / micro_f1 / macro_f1 / weighted_f1 (per model),
    - n_correct_all: srcs this model AND every other model got right,
    - n_correct_unique: srcs ONLY this model got right,
    - n_consensus_correct: srcs where all models agree and the vote is right.
    """
    n_models = len(results)
    all_rows = _tag(results)
    correct = all_rows.filter(F.col("pred") == F.col("true"))
    per_src = correct.groupBy("src").agg(
        F.countDistinct("model").alias("n_right"),
        F.min("model").alias("only_model"),
    )
    inter = per_src.filter(F.col("n_right") == n_models).count()
    uniq = (
        per_src.filter(F.col("n_right") == 1)
        .groupBy("only_model")
        .agg(F.count("*").alias("n_correct_unique"))
    )
    cons_correct = (
        consensus(all_rows, n_models=n_models).filter("correct").count()
    )

    out = None
    for model in sorted(results):
        m = classification_metrics(results[model]).select(
            F.lit(model).alias("model"),
            "n", "accuracy", "micro_f1", "macro_f1", "weighted_f1",
        )
        out = m if out is None else out.unionByName(m)
    return (
        out.join(F.broadcast(uniq.withColumnRenamed("only_model", "model")), "model", "left")
        .fillna(0, subset=["n_correct_unique"])
        .withColumn("n_correct_all", F.lit(inter))
        .withColumn("n_consensus_correct", F.lit(cons_correct))
    )


def confusion_pivot(pairs: DataFrame, pred_col: str = "pred", true_col: str = "true") -> DataFrame:
    """Wide confusion matrix (one row per true label, one column per
    predicted label) — the heatmap input frame (evaluator.py:135-159).
    Labels discovered from the data; bounded collect (label vocabulary).
    Null labels (e.g. an unmatched extraction) are coalesced to 'none'
    before the vocabulary sort — sorted() over mixed None/str throws."""
    p = F.coalesce(F.col(pred_col), F.lit("none")).alias("__pred")
    t = F.coalesce(F.col(true_col), F.lit("none")).alias("true_label")
    coalesced = pairs.select(p, t)
    labels = sorted(
        r["l"]
        for r in coalesced.select(F.col("__pred").alias("l"))
        .unionByName(coalesced.select(F.col("true_label").alias("l")))
        .distinct()
        .collect()
    )
    return (
        coalesced.groupBy("true_label")
        .pivot("__pred", labels)
        .count()
        .fillna(0, subset=labels)
        .orderBy("true_label")
    )


def render_confusion(pairs: DataFrame, pred_col: str = "pred", true_col: str = "true") -> str:
    """Text heatmap of the confusion pivot (driver-side, label-vocabulary
    sized). The PNG the reference writes is one plt.imshow away from the
    confusion_pivot frame; this renderer keeps the artifact dependency-free."""
    wide = confusion_pivot(pairs, pred_col, true_col)
    cols = wide.columns  # true_label first, then labels
    rows = wide.collect()
    widths = [
        max(len(str(c)), *(len(str(r[c])) for r in rows)) if rows else len(str(c))
        for c in cols
    ]
    header = "  ".join(str(c).rjust(w) for c, w in zip(cols, widths))
    lines = [header]
    for r in rows:
        lines.append("  ".join(str(r[c]).rjust(w) for c, w in zip(cols, widths)))
    return "\n".join(lines)


# --- PNG heatmap (reference evaluator.py:135-159 renders the confusion
# matrix as a PNG via matplotlib; this container has no matplotlib, so the
# artifact is produced with a stdlib-only encoder: zlib + struct are the
# whole PNG spec for an uncompressed-filter RGB image). Driver-side and
# label-vocabulary bounded, like the reference's plot call. ---

# 3x5 bitmap digits for in-cell count overlays (row-major, 1 = lit).
_DIGITS = {
    "0": "111101101101111", "1": "010110010010111", "2": "111001111100111",
    "3": "111001111001111", "4": "101101111001001", "5": "111100111001111",
    "6": "111100111101111", "7": "111001010010010", "8": "111101111101111",
    "9": "111101111001111",
}


def _viridis(x: float) -> tuple[int, int, int]:
    """Piecewise-linear approximation of the viridis colormap on [0, 1]."""
    anchors = [
        (0.0, (68, 1, 84)), (0.25, (59, 82, 139)), (0.5, (33, 145, 140)),
        (0.75, (94, 201, 98)), (1.0, (253, 231, 37)),
    ]
    x = min(max(x, 0.0), 1.0)
    for (x0, c0), (x1, c1) in zip(anchors, anchors[1:]):
        if x <= x1:
            t = 0.0 if x1 == x0 else (x - x0) / (x1 - x0)
            return tuple(round(a + t * (b - a)) for a, b in zip(c0, c1))
    return anchors[-1][1]


def png_encode(w: int, h: int, rgb: bytes, level: int = 6) -> bytes:
    """Encode raw RGB bytes as a minimal PNG (8-bit RGB, filter 0 rows,
    one IDAT). The matching stdlib decoder lives in
    multimodal/binary_ops.py:_png_parse — round-trip property-tested."""
    raw = b"".join(b"\x00" + rgb[y * w * 3 : (y + 1) * w * 3] for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level))
        + chunk(b"IEND", b"")
    )


def _write_png(path: str, pixels: list[list[tuple[int, int, int]]]) -> None:
    h, w = len(pixels), len(pixels[0])
    rgb = b"".join(b"".join(bytes(px) for px in row) for row in pixels)
    with open(path, "wb") as f:
        f.write(png_encode(w, h, rgb))


def confusion_png(
    pairs: DataFrame,
    path: str,
    pred_col: str = "pred",
    true_col: str = "true",
    labels: list[str] | None = None,
    cell: int = 48,
) -> list[str]:
    """Render the confusion matrix as a PNG heatmap at ``path`` and a label
    legend sidecar at ``path + '.labels.txt'``; returns the ordered label
    vocabulary. Mirrors reference evaluator.py:135-159: when ``labels`` is
    given it is lowercased and predictions outside the vocabulary are
    dropped (the reference deletes those rows before confusion_matrix);
    otherwise labels are discovered from the data. Cells are viridis-colored
    by count normalized to the matrix max, with the count overlaid in 3x5
    bitmap digits; axis labels are row/column indices resolved by the
    sidecar (arbitrary-text glyphs are out of scope for a stdlib encoder).
    Everything upstream of the final bounded collect is a DataFrame."""
    if labels is not None:
        labels = [x.lower() for x in labels]
        pairs = pairs.filter(F.lower(F.col(pred_col)).isin(labels)).select(
            F.lower(F.col(pred_col)).alias(pred_col),
            F.lower(F.col(true_col)).alias(true_col),
        )
    wide = confusion_pivot(pairs, pred_col, true_col)
    vocab = wide.columns[1:]
    if labels is not None:
        vocab = [l for l in labels if l in set(vocab)]
    by_true = {r["true_label"]: r for r in wide.collect()}
    counts = [
        [int(by_true[t][p]) if t in by_true else 0 for p in vocab]
        for t in vocab
    ]
    peak = max((c for row in counts for c in row), default=0) or 1

    n = len(vocab)
    margin = cell // 2
    size_w, size_h = margin + n * cell, margin + n * cell
    pixels = [[(255, 255, 255)] * size_w for _ in range(size_h)]
    for i in range(n):          # true label rows
        for j in range(n):      # predicted label columns
            color = _viridis(counts[i][j] / peak)
            y0, x0 = margin + i * cell, margin + j * cell
            for y in range(y0, y0 + cell):
                for x in range(x0, x0 + cell):
                    pixels[y][x] = color
            # count overlay, centered, 2x-scaled 3x5 digits
            text = str(counts[i][j])
            glyph_w, scale = 4, 2
            tw = len(text) * glyph_w * scale - scale
            ox = x0 + (cell - tw) // 2
            oy = y0 + (cell - 5 * scale) // 2
            ink = (255, 255, 255) if sum(color) < 380 else (0, 0, 0)
            for k, ch in enumerate(text):
                bits = _DIGITS.get(ch)
                if not bits:
                    continue
                for gy in range(5):
                    for gx in range(3):
                        if bits[gy * 3 + gx] == "1":
                            for sy in range(scale):
                                for sx in range(scale):
                                    py = oy + gy * scale + sy
                                    px = ox + k * glyph_w * scale + gx * scale + sx
                                    if 0 <= py < size_h and 0 <= px < size_w:
                                        pixels[py][px] = ink
    # index ticks in the margins (axis text lives in the sidecar legend)
    for i in range(n):
        for k, ch in enumerate(str(i)):
            bits = _DIGITS.get(ch, "")
            for gy in range(5):
                for gx in range(3):
                    if gy * 3 + gx < len(bits) and bits[gy * 3 + gx] == "1":
                        y = margin + i * cell + cell // 2 - 2 + gy
                        x = 2 + k * 4 + gx
                        pixels[y][x] = (0, 0, 0)            # left: true idx
                        ty = 2 + gy
                        tx = margin + i * cell + cell // 2 - 2 + k * 4 + gx
                        pixels[ty][tx] = (0, 0, 0)          # top: pred idx
    _write_png(path, pixels)
    with open(path + ".labels.txt", "w") as f:
        f.write("idx\tlabel\n")
        for i, l in enumerate(vocab):
            f.write(f"{i}\t{l}\n")
    return list(vocab)
