"""Declarative check registry — the engine's user-extension surface.

RAQC's extension surface is a validated ``.ini``: sections select which flag
stages run and with what thresholds (``[R] raqc/CoreConfig.ini,
recipes.ini :: [flags]/[difference_arrays]/[histogram_outliers]/
[block_behavior] (rec., H)``; SURVEY.md §2.10).  Here each section becomes a
``CheckSpec`` dataclass; a ``RunConfig`` is the list of selected checks plus
execution knobs.  New checks = new CheckSpec subclasses registered in
``CHECK_TYPES`` (the UDF hook).

Check kinds and their RAQC analogs:

- ``NullityCheck`` / ``RangeCheck`` — basic + advanced conditional masks
  (``mask_basic`` / ``mask_advanced``), SURVEY.md §2.2 M3/M4.
- ``CaptionCheck`` — caption quality predicate (empty / whitespace-only).
- ``DecodeCheck`` — "pixel is readable" reimagined: payload decodes and
  matches declared dims (SURVEY.md §2.2 M8; BASELINE.json:15 invariant).
- ``StatsCheck`` / ``CardinalityCheck`` / ``QuantileCheck`` — per-partition
  column stats via mergeable partials (SURVEY.md §2.5 A6/A7/A8).
- ``Hist2DCheck`` — the 2-D histogram (A1); feeds ``DriftCheck``.
- ``UniquenessCheck`` / ``NearDupCheck`` / ``ReferentialCheck`` — shuffle
  checks (A9/A10/J2).
- ``DriftCheck`` — PSI/KS between repeat epochs over the fixed-bin 2-D
  histogram + moving-window outlier bins (F1/W2 analog).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CheckSpec:
    severity: str = "error"
    # W1 "flag blocks" debounce at partition granularity (SURVEY.md §2.8):
    # a partition FAILS the check only when it holds >= min_support
    # violations — RAQC's moving-window neighbor filter converts speckle
    # into blocks; min_support converts stray violations into verdicts the
    # same way (``[R] raqc/multi_array.py :: PatternFilters.mov_wind2
    # (rec.)``). Violation rows are always emitted regardless.
    min_support: int = 1

    @property
    def name(self) -> str:  # check name used in violation/verdict rows
        raise NotImplementedError


@dataclass(frozen=True)
class NullityCheck(CheckSpec):
    """Columns that must be non-null. RAQC: nodata mask."""

    columns: tuple[str, ...] = ()

    @property
    def name(self) -> str:
        return "nullity"


@dataclass(frozen=True)
class RangeRule:
    column: str
    min: float | None = None
    max: float | None = None
    # for binary columns: bounds apply to byte length
    is_binary_length: bool = False


@dataclass(frozen=True)
class RangeCheck(CheckSpec):
    """Config-driven per-column bounds. RAQC: ``[difference_arrays]``
    operator/value conditional masks (``[R] mask_advanced (rec.)``)."""

    rules: tuple[RangeRule, ...] = ()

    @property
    def name(self) -> str:
        return "range"


@dataclass(frozen=True)
class ExprRule:
    """Named declarative predicate over columns: ``expr`` is the
    pure-tuple AST of `ops/exprcheck.compile_expr` (hashable, so the
    config hash / checkpoint invalidation sees rule edits)."""

    name: str
    expr: tuple


@dataclass(frozen=True)
class ExprCheck(CheckSpec):
    """Deequ-style cross-column expression constraints — the
    generalization of RangeCheck to arbitrary arithmetic/boolean
    predicates over several columns.  A row violates a rule where the
    predicate is NOT TRUE (FALSE or NULL — SQL ``IS NOT TRUE``).
    Rules run only on rows that PASSED RangeCheck (the RAQC mask
    chain: advanced masks apply after basic masks), so a ``w=0`` row
    reports ``range`` once instead of range+expr — the FIXTURES.md §3
    each-corruption-surfaces-exactly-once discipline.
    RAQC: ``[R] mask_advanced (rec.)`` generalized."""

    rules: tuple[ExprRule, ...] = ()

    @property
    def name(self) -> str:
        return "expr"


@dataclass(frozen=True)
class CaptionCheck(CheckSpec):
    column: str = "caption"

    @property
    def name(self) -> str:
        return "caption"


@dataclass(frozen=True)
class DecodeCheck(CheckSpec):
    """Decode ``bytes`` per ``fmt``; verify decodability and declared dims.

    Gated like RAQC's mask chain: rows already failing nullity (null/empty
    bytes) or range (w/h out of bounds) are skipped — each planted
    corruption surfaces exactly once (FIXTURES.md §3 disjointness).
    Also computes the per-row ``pixel_mean`` feature for Hist2DCheck.
    """

    bytes_col: str = "bytes"
    fmt_col: str = "fmt"
    w_col: str = "w"
    h_col: str = "h"
    w_min: int = 1
    w_max: int = 16_384

    @property
    def name(self) -> str:
        return "decode"


@dataclass(frozen=True)
class ExposureCheck(CheckSpec):
    """Per-image exposure quality from the SAME pixels the DecodeCheck
    already pays to decode (no second decode): an image is a violation
    when its clipped-pixel fraction — exact luma cents ``<= lo_c`` or
    ``>= hi_c`` (`ops/exposure.pixel_stats_of`) — exceeds
    ``max_clip_permille``, by the exact rational test
    ``(n_lo + n_hi) * 1000 > max_clip_permille * n_px``.  Requires a
    DecodeCheck in the same config.  RAQC analog: conditional masks
    over the pixel statistic itself (SURVEY §2.2 M4 at pixel
    granularity; `ops/exposure` is the standalone census sibling)."""

    lo_c: int = 2000
    hi_c: int = 23500
    # 150‰: clean synthetic fixtures measure ≤ 63‰ clipped (worst of
    # 400 samples incl. the e2 brightness shift) — 2.4× headroom —
    # while the planted dark rows clip at 1000‰
    max_clip_permille: int = 150

    @property
    def name(self) -> str:
        return "exposure"


@dataclass(frozen=True)
class StatsCheck(CheckSpec):
    """Per-partition null count / min / max / mean per column (A6)."""

    columns: tuple[str, ...] = ()

    @property
    def name(self) -> str:
        return "stats"


@dataclass(frozen=True)
class CardinalityCheck(CheckSpec):
    """HyperLogLog distinct estimate of a column per partition + global (A7)."""

    column: str = "image_id"
    p: int = 12

    @property
    def name(self) -> str:
        return f"cardinality:{self.column}"


@dataclass(frozen=True)
class QuantileCheck(CheckSpec):
    """t-digest quantiles per partition + global (A2/A3/A8).

    ``outlier_percentiles`` mirrors RAQC ``[block_behavior]
    outlier_percentiles``: the verdict's stats_json reports the fraction of
    the partition's mass beyond the *global* (basin-wide) quantile
    thresholds — the F2 ``flag_basin_*`` analog at partition granularity.
    """

    column: str = "w"
    quantiles: tuple[float, ...] = (0.05, 0.25, 0.5, 0.75, 0.95)
    outlier_percentiles: tuple[float, float] = (0.05, 0.95)
    delta: int = 200

    @property
    def name(self) -> str:
        return f"quantile:{self.column}"


@dataclass(frozen=True)
class BandQuantileCheck(CheckSpec):
    """Per-band quantile thresholds (A2 / F3 ``flag_elevation_*`` analog).

    The band key is the engine's "elevation band": a bucketed feature
    (default: integer log2 of the payload byte length, the size-band
    analog of DEM elevation bins — ``[R] raqc/utilities.py ::
    get_elevation_bins (rec.)``).  Pass A accumulates one t-digest of
    ``value`` per (partition, band); the verdict stage merges per-band
    global digests, takes ``outlier_percentiles`` thresholds per band
    (the broadcast threshold-table lookup, J3), and reports each
    partition's mass fraction beyond its bands' thresholds.  A partition
    fails when that fraction exceeds ``max_outlier_fraction`` (None →
    informational, always passes).
    """

    value: str = "__pixel_mean__"
    band_of: str = "__bytelen_log2__"
    band_width: float = 1.0
    outlier_percentiles: tuple[float, float] = (0.05, 0.95)
    max_outlier_fraction: float | None = None
    delta: int = 100
    # F4 (SURVEY.md §2.9, RAQC ``flag_tree_*`` analog): optional categorical
    # conditioning column (e.g. ``fmt``) — when set, thresholds are computed
    # per (category, band) so an outlier is judged against ITS category's
    # distribution (outlier ∧ side-attribute predicate).
    condition_on: str = ""

    @property
    def name(self) -> str:
        return "band_quantile"


@dataclass(frozen=True)
class Hist2DCheck(CheckSpec):
    """Fixed-bin 2-D histogram partials per partition (A1).

    ``x``/``y`` name either a physical column or a built-in feature:
    ``__bytelen_log2__`` (log2 of binary length of ``bytes``) or
    ``__pixel_mean__`` (mean decoded luma, requires DecodeCheck).
    Bin edges are fixed by config — shared across epochs, exactly as RAQC
    fixes ``[histogram_outliers] num_bins`` so repeat histograms align.
    """

    x: str = "__bytelen_log2__"
    y: str = "__pixel_mean__"
    bins: int = 20
    x_range: tuple[float, float] = (8.0, 24.0)
    y_range: tuple[float, float] = (0.0, 255.0)

    @property
    def name(self) -> str:
        return "hist2d"


@dataclass(frozen=True)
class UniquenessCheck(CheckSpec):
    """Key must be globally unique (A9): hash-partitioned groupby-count."""

    column: str = "image_id"

    @property
    def name(self) -> str:
        return "uniqueness"


@dataclass(frozen=True)
class NearDupCheck(CheckSpec):
    """Near-duplicate detection on a 64-bit hash column (A10).

    Pigeonhole banding: split the 64 bits into ``max_hamming + 1`` bands —
    any pair within Hamming ≤ max_hamming matches exactly in ≥ 1 band.
    Groups larger than ``hot_bucket_cap`` switch from all-pairs to a
    sorted windowed scan (skew handling; BASELINE.json:14 "salted keys for
    hot phash buckets" — see checks/neardup.py for the scan contract).
    """

    column: str = "phash"
    max_hamming: int = 2
    hot_bucket_cap: int = 256
    window: int = 64

    @property
    def name(self) -> str:
        return "near_dup"


@dataclass(frozen=True)
class ReferentialCheck(CheckSpec):
    """Captions ⋈ images on image_id (J2): orphans both ways + equality.

    Caption-equality comparison applies only to 1:1 groups; multi-occurrence
    ids are UniquenessCheck's responsibility (disjoint reporting).
    """

    side_path: str = ""  # parquet path(s) of the captions table
    key: str = "image_id"
    compare: str = "caption"

    @property
    def name(self) -> str:
        return "referential"


@dataclass(frozen=True)
class DriftCheck(CheckSpec):
    """Epoch-pair drift verdicts from Hist2DCheck partials (F1/W2 analog).

    PSI and KS are computed per later-epoch partition against the earlier
    epoch's merged histogram; ``psi_threshold`` gates pass/fail.  Outlier
    bins come from a moving-window low-occupancy scan over the combined
    histogram (RAQC ``[histogram_outliers] threshold_histogram_space`` /
    ``outliers_hist`` (rec.)).
    """

    psi_threshold: float = 0.2
    ks_threshold: float = 0.2
    moving_window: int = 3
    space_threshold: float = 0.16  # fraction of window mass below which a bin is an outlier

    @property
    def name(self) -> str:
        return "drift"


@dataclass
class RunConfig:
    """One validation run over one epoch of one table."""

    checks: list[CheckSpec] = field(default_factory=list)
    epoch: str = "e1"
    # partition id source: ("path", regex_group) | ("column", name) | ("none",)
    partition_from: tuple = ("path", r"part-(\d+)\.parquet")
    batch_size: int = 256
    # None → auto-size to ~3/4 of cluster CPUs, always leaving headroom for
    # the read/reduce stages (a pool that reserves every CPU starves the
    # reader and the pipeline stalls).
    decode_concurrency: int | tuple[int, int] | None = None
    read_columns: tuple[str, ...] | None = None
    # Wide partial-merge path for epochs whose per-batch partial stream
    # is itself too large for the sliced single-task reduce (10^12-row
    # epochs): per-block combiner + distributed groupby/map_groups merge.
    # Byte-identical verdicts either way (test_wide_partials); also
    # forced by RAQC_WIDE_PARTIALS=1.  Triggers AUTOMATICALLY when the
    # materialized partial stream exceeds wide_partials_threshold rows
    # (same decide-by-size pattern as checks/_util.decide_path), so the
    # default config is 10^12-row-safe without opt-in.
    wide_partials: bool = False
    wide_partials_threshold: int = 2_000_000
    # Below this many materialized fused-partial rows, the shuffle
    # checks' phase-1 streams are split ONCE in a remote task into three
    # in-store arrow tables (checks/_util.TablePartials) instead of three
    # filtered Dataset views — each view cost a full streaming-executor
    # run whose driver-side loop was the measured 32-CPU scaling floor.
    # Above it (10^12-row scale), the Dataset views + per-check
    # distributed aggregation paths run unchanged.  16M all-int64 rows
    # ≈ 250 MB in one split task / one reduce task — well inside a
    # worker heap, far above the bench fixture (~2.4M rows/epoch).
    fused_split_threshold: int = 16_000_000

    def row_stat_checks(self) -> list[CheckSpec]:
        return [
            c
            for c in self.checks
            if isinstance(
                c,
                (
                    NullityCheck,
                    RangeCheck,
                    CaptionCheck,
                    DecodeCheck,
                    ExposureCheck,
                    StatsCheck,
                    CardinalityCheck,
                    QuantileCheck,
                    BandQuantileCheck,
                    Hist2DCheck,
                ),
            )
        ]

    def get(self, cls):
        for c in self.checks:
            if isinstance(c, cls):
                return c
        return None


def default_image_config(epoch: str, captions_path: str = "") -> RunConfig:
    """The full constraint suite over the binding images schema."""
    checks: list[CheckSpec] = [
        NullityCheck(columns=("image_id", "bytes", "caption")),
        RangeCheck(
            rules=(
                RangeRule("w", 1, 16_384),
                RangeRule("h", 1, 16_384),
                RangeRule("bytes", 1, None, is_binary_length=True),
            )
        ),
        CaptionCheck(),
        # cross-column invariant (SURVEY §2.2 M4 generalized): images
        # must carry at least 32×32 = 1024 declared pixels
        ExprCheck(rules=(
            ExprRule("min_area",
                     (">=", ("*", ("col", "w"), ("col", "h")),
                      ("lit", 1024))),
        )),
        DecodeCheck(),
        ExposureCheck(),
        StatsCheck(columns=("w", "h", "phash")),
        CardinalityCheck(column="image_id"),
        QuantileCheck(column="w"),
        BandQuantileCheck(),
        Hist2DCheck(),
        UniquenessCheck(column="image_id"),
        NearDupCheck(column="phash"),
        DriftCheck(),
    ]
    if captions_path:
        checks.append(ReferentialCheck(side_path=captions_path))
    return RunConfig(checks=checks, epoch=epoch)
