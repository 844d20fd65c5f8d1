"""Vectorized string scalar functions over a Dataset column — the
§2.7 scalar-function surface for text (length / case / slice / regex
replace), all ``pyarrow.compute`` kernels over the block's UTF-8
buffer: no Python per row, no copy besides the output column.

Semantics match DuckDB/ANSI for the implemented subset (verified by
the q53-family oracles): ``length`` counts codepoints
(``pc.utf8_length``), ``upper``/``lower`` are full-Unicode,
``substr(s, 1, n)`` is 1-based (``pc.utf8_slice_codeunits(0, n)``),
``regexp_replace(..., 'g')`` is global (``pc.replace_substring_regex``).

RAQC analog: SURVEY §2.7 (the reference's scalar functions are
numeric raster ops only); text scalars are part of the §2
training-data-pipeline surface.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def string_features(ds, col: str, head_chars: int = 8,
                    strip_pattern: str | None = None,
                    strip_replacement: str = ""):
    """Appends ``{col}_len`` (int64 codepoints), ``{col}_head``
    (uppercased first ``head_chars`` codepoints) and — when
    ``strip_pattern`` is given — ``{col}_stripped`` (global regex
    replace)."""

    def fn(b: pa.Table) -> pa.Table:
        s = b[col]
        b = b.append_column(f"{col}_len",
                            pc.cast(pc.utf8_length(s), pa.int64()))
        b = b.append_column(
            f"{col}_head",
            pc.utf8_upper(pc.utf8_slice_codeunits(s, 0, head_chars)))
        if strip_pattern is not None:
            b = b.append_column(
                f"{col}_stripped",
                pc.replace_substring_regex(s, strip_pattern,
                                           strip_replacement))
        return b

    return ds.map_batches(fn, batch_format="pyarrow")


#: PII-ish detection presets for training-data quality filtering.
#: Both pyarrow.compute and DuckDB regex kernels are RE2, so the same
#: pattern string runs identically on the engine and the SQL oracle.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
}


def normalize_text(ds, col: str, id_cols: list[str]):
    """Canonical text normalization — the dedup/quality pre-pass of a
    training-data pipeline: lowercase → non-alphanumeric runs to one
    space → trim.  Appends ``norm`` and ``n_norm_tokens`` (token count
    of the normalized form).

    All ``pyarrow.compute`` kernels over the block's UTF-8 buffer (no
    Python per row); both pyarrow and DuckDB regex-replace are RE2, so
    the DuckDB oracle ``trim(regexp_replace(lower(s), '[^a-z0-9]+',
    ' ', 'g'))`` is exact."""

    def fn(b: pa.Table) -> pa.Table:
        s = pc.utf8_lower(b[col])
        s = pc.replace_substring_regex(s, r"[^a-z0-9]+", " ")
        s = pc.utf8_trim_whitespace(s)
        out = b.select(id_cols)
        out = out.append_column("norm", s)
        n = pc.count_substring_regex(s, pattern=r"[a-z0-9]+")
        out = out.append_column("n_norm_tokens", pc.cast(n, pa.int64()))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def regex_features(ds, col: str, patterns: dict[str, str],
                   id_cols: list[str]):
    """Per-row regex feature extraction: for each named pattern,
    appends ``n_<name>`` (int64 count of non-overlapping matches) and
    ``first_<name>`` (first match, '' when none) — the PII / markup /
    boilerplate detection stage of a training-data pipeline.

    Fully vectorized over the Arrow UTF-8 buffer
    (``pc.count_substring_regex`` / ``pc.extract_regex``, RE2); only
    ``id_cols`` + the feature columns leave the stage, so the text
    never reshuffles.  DuckDB equivalents: ``len(regexp_extract_all)``
    / ``regexp_extract``.
    """

    def fn(b: pa.Table) -> pa.Table:
        s = b[col]
        out = b.select(id_cols)
        for name, pat in patterns.items():
            out = out.append_column(
                f"n_{name}",
                pc.cast(pc.count_substring_regex(s, pattern=pat),
                        pa.int64()))
            ex = pc.extract_regex(s, pattern=f"(?P<m>{pat})")
            out = out.append_column(
                f"first_{name}",
                pc.fill_null(pc.struct_field(ex, "m"), ""))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def redact(ds, col: str, id_cols: list[str],
           patterns: dict[str, str] | None = None,
           out_col: str = "red_text", count_col: str = "n_redacted"):
    """PII redaction — replace every match of each named pattern with
    its ``[NAME]`` placeholder and count total replacements; the
    repair-side counterpart of :func:`regex_features` (detect) in a
    training-data pipeline.

    Patterns apply in dict order, each to the PREVIOUS pass's output
    (same composition as nested SQL ``regexp_replace``); match counts
    are taken on the ORIGINAL text.  All ``pc.replace_substring_regex``
    / ``pc.count_substring_regex`` over the block's UTF-8 buffer — RE2
    on both sides, so the nested DuckDB
    ``regexp_replace(..., 'g')`` oracle is exact.  Defaults to
    :data:`PII_PATTERNS`.
    """
    pats = patterns if patterns is not None else PII_PATTERNS

    def fn(b: pa.Table) -> pa.Table:
        orig = b[col]
        s = orig
        n = None
        for name, pat in pats.items():
            s = pc.replace_substring_regex(
                s, pat, f"[{name.upper()}]")
            c = pc.count_substring_regex(orig, pattern=pat)
            n = c if n is None else pc.add(n, c)
        out = b.select(id_cols)
        out = out.append_column(out_col, s)
        out = out.append_column(count_col, pc.cast(n, pa.int64()))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")
