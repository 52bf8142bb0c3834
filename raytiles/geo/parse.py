"""Geoparsing: extract lat/lon mentions from web-page text.

A stateless map_batches stage (regex compiled once per actor /
process). Three mention grammars, chosen to be exactly re-expressible
in the DuckDB oracle's regexp functions:

  fmt1:  "located at 37.7749, -122.4194"
  fmt2:  "(lat 51.5074, lon -0.1278)"
  fmt3:  "40.7128N 74.0060W"           (hemisphere-suffixed, abs values)

All coordinates are printed with exactly 4 decimals by the generator;
the \\d{1,3}\\.\\d{4} shape keeps decoy numerals (prices "12.99",
versions "3.2.1", dates "12.05.2024") from parsing. Mentions are
indexed by appearance order within the document (mention_idx, 0-based).
Out-of-range coordinates (|lat| > 85.05, |lon| > 180) are dropped.

SQL twin (see __ray_entry__.oracle_sql):
  unnest(regexp_extract_all(text, MASTER_RE)) with
  generate_subscripts(...) for order, then per-match CASE parsing.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# NOTE: keep these three in sync with the oracle SQL in __ray_entry__.py.
FMT1 = r"located at (-?\d{1,2}\.\d{4}), (-?\d{1,3}\.\d{4})"
FMT2 = r"\(lat (-?\d{1,2}\.\d{4}), lon (-?\d{1,3}\.\d{4})\)"
FMT3 = r"(\d{1,2}\.\d{4})([NS]) (\d{1,3}\.\d{4})([EW])"

# alternation for in-order matching; grammars have disjoint prefixes
MASTER_RE = f"(?:{FMT1})|(?:{FMT2})|(?:{FMT3})"

# Named-group twin for pyarrow (RE2) extract_regex: same alternation,
# same leftmost-first semantics as Python re on these grammars (the
# alternatives can never match at the same start: distinct anchors).
FMT1N = r"located at (?P<a1>-?\d{1,2}\.\d{4}), (?P<a2>-?\d{1,3}\.\d{4})"
FMT2N = r"\(lat (?P<b1>-?\d{1,2}\.\d{4}), lon (?P<b2>-?\d{1,3}\.\d{4})\)"
FMT3N = r"(?P<c1>\d{1,2}\.\d{4})(?P<c2>[NS]) (?P<c3>\d{1,3}\.\d{4})(?P<c4>[EW])"
MASTER_RE_NAMED = f"(?:{FMT1N})|(?:{FMT2N})|(?:{FMT3N})"

# extract_regex rounds before falling back to the Python scanner for
# pathological many-mention docs (each round costs two C++ passes over
# the still-matching subset; typical corpus maxes out at < 10).
MAX_RE2_ROUNDS = 32

MAX_LAT = 85.05


class GeoParser:
    """Callable for map_batches: regex compiled once per PROCESS (the
    module-level cache makes this equally cheap as a task function or
    an actor __init__ — task pools skip actor spin-up latency)."""

    _compiled = None

    _compiled_b = None

    def __init__(self) -> None:
        cls = type(self)
        if cls._compiled is None:
            cls._compiled = re.compile(MASTER_RE)
            cls._compiled_b = re.compile(MASTER_RE.encode())
        self.master = cls._compiled
        self.master_b = cls._compiled_b
        # cheap vectorized prefilter: every grammar contains a
        # 4-decimal numeral, absent from ~half the corpus
        self.prefilter = r"\d\.\d{4}"

    def parse_series(self, texts: pd.Series):
        """-> DataFrame (row_pos, mention_idx, lat, lon) with row_pos
        the positional index into ``texts``."""
        empty = pd.DataFrame({"row_pos": np.empty(0, np.int64),
                              "mention_idx": np.empty(0, np.int32),
                              "lat": np.empty(0, np.float64),
                              "lon": np.empty(0, np.float64)})
        if texts.empty:
            return empty
        # ONE finditer over a \x00-joined buffer (no grammar matches
        # across \x00), matches mapped back to rows via searchsorted —
        # ~3x faster than Series.str.extractall, whose MultiIndex
        # DataFrame construction dominates its cost.
        lens = texts.str.len().to_numpy()
        joined = "\x00".join(texts.tolist())
        starts = np.zeros(lens.size + 1, dtype=np.int64)
        np.cumsum(lens + 1, out=starts[1:])
        positions, groups = [], []
        for m in self.master.finditer(joined):
            positions.append(m.start())
            groups.append(m.groups())
        if not positions:
            return empty
        row_pos = np.searchsorted(starts, np.array(positions, dtype=np.int64),
                                  side="right") - 1
        # group columns: 0,1 = fmt1 lat/lon; 2,3 = fmt2; 4..7 = fmt3
        g = np.array(groups, dtype=object)
        lat = np.empty(len(groups), dtype=np.float64)
        lon = np.empty(len(groups), dtype=np.float64)
        f1 = pd.notna(g[:, 0])
        f2 = pd.notna(g[:, 2])
        f3 = pd.notna(g[:, 4])
        lat[f1] = g[f1, 0].astype(np.float64)
        lon[f1] = g[f1, 1].astype(np.float64)
        lat[f2] = g[f2, 2].astype(np.float64)
        lon[f2] = g[f2, 3].astype(np.float64)
        lat[f3] = g[f3, 4].astype(np.float64) * np.where(g[f3, 5] == "N", 1.0, -1.0)
        lon[f3] = g[f3, 6].astype(np.float64) * np.where(g[f3, 7] == "E", 1.0, -1.0)
        keep = (np.abs(lat) <= MAX_LAT) & (np.abs(lon) <= 180.0)
        row_pos = row_pos[keep]
        # mention_idx: appearance order within each row (finditer is
        # buffer-ordered, so row runs are consecutive)
        run_first = np.zeros(row_pos.size, dtype=np.int64)
        if row_pos.size:
            change = np.empty(row_pos.size, dtype=bool)
            change[0] = True
            change[1:] = row_pos[1:] != row_pos[:-1]
            firsts = np.flatnonzero(change)
            run_first = np.repeat(firsts, np.diff(np.concatenate([firsts, [row_pos.size]])))
        mention_idx = (np.arange(row_pos.size, dtype=np.int64) - run_first).astype(np.int32)
        return pd.DataFrame({"row_pos": row_pos,
                             "mention_idx": mention_idx,
                             "lat": lat[keep], "lon": lon[keep]})

    def parse_arrow(self, col):
        """Arrow StringArray -> (row_pos, mention_idx, lat, lon) numpy
        arrays via pure-RE2 kernels (pyarrow.compute), no Python
        strings: each round, ``extract_regex`` takes the FIRST
        remaining match per doc (named-group master pattern; appearance
        order == round number) and ``split_pattern_regex(max_splits=1)``
        advances matched docs to the text after that match. Both passes
        are C++ over Arrow buffers; the candidate set shrinks each
        round (round r holds only docs with > r mentions), so total
        work ~ sum of per-round survivor bytes. Docs still matching
        after MAX_RE2_ROUNDS rounds finish on the Python scanner
        (identical grammars) so pathological many-mention docs stay
        linear. Measured 1.6x faster than the single-pass Python
        finditer over a NUL-joined buffer, with byte-identical output."""
        import pyarrow as pa
        import pyarrow.compute as pc
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        empty = (np.empty(0, np.int64), np.empty(0, np.int32),
                 np.empty(0, np.float64), np.empty(0, np.float64))
        if n == 0:
            return empty
        if not pa.types.is_string(col.type):
            col = col.cast(pa.string())
        remaining = col
        idx = np.arange(n, dtype=np.int64)
        rows_l, seq_l, structs = [], [], []
        rnd = 0
        while len(remaining) and rnd < MAX_RE2_ROUNDS:
            groups = pc.extract_regex(remaining, MASTER_RE_NAMED)
            valid = pc.is_valid(groups)
            matched_structs = groups.drop_null()
            if len(matched_structs) == 0:
                remaining = remaining.slice(0, 0)
                break
            vmask = valid.to_numpy(zero_copy_only=False)
            idx = idx[vmask]
            rows_l.append(idx)
            seq_l.append(np.full(idx.size, rnd, dtype=np.int64))
            structs.append(matched_structs)
            matched_texts = remaining.filter(valid)
            remaining = pc.list_element(
                pc.split_pattern_regex(matched_texts, MASTER_RE_NAMED,
                                       max_splits=1), 1)
            rnd += 1
        if structs:
            st = structs[0] if len(structs) == 1 else pa.concat_arrays(structs)
            g = [st.field(i).to_numpy(zero_copy_only=False) for i in range(8)]
            row_r = np.concatenate(rows_l)
            seq_r = np.concatenate(seq_l)
            lat_r = np.empty(row_r.size, dtype=np.float64)
            lon_r = np.empty(row_r.size, dtype=np.float64)
            # unmatched alternative groups extract as "" (RE2), never
            # legitimately empty (every group matches >= 6 chars)
            f1 = g[0] != ""
            f2 = g[2] != ""
            f3 = g[4] != ""
            lat_r[f1] = g[0][f1].astype(np.float64)
            lon_r[f1] = g[1][f1].astype(np.float64)
            lat_r[f2] = g[2][f2].astype(np.float64)
            lon_r[f2] = g[3][f2].astype(np.float64)
            lat_r[f3] = g[4][f3].astype(np.float64) * np.where(g[5][f3] == "N", 1.0, -1.0)
            lon_r[f3] = g[6][f3].astype(np.float64) * np.where(g[7][f3] == "E", 1.0, -1.0)
        else:
            row_r = np.empty(0, np.int64)
            seq_r = np.empty(0, np.int64)
            lat_r = np.empty(0, np.float64)
            lon_r = np.empty(0, np.float64)
        if len(remaining):
            # stragglers: > MAX_RE2_ROUNDS mentions — scan their tails
            # with the Python path, seq continues from the round count
            frow, fseq, flat, flon = self._py_scan_arrow(remaining)
            row_r = np.concatenate([row_r, idx[frow]])
            seq_r = np.concatenate([seq_r, MAX_RE2_ROUNDS + fseq])
            lat_r = np.concatenate([lat_r, flat])
            lon_r = np.concatenate([lon_r, flon])
        if row_r.size == 0:
            return empty
        # matches arrive grouped by ROUND; the run-length mention_idx
        # below needs them grouped by row in appearance order
        order = np.lexsort((seq_r, row_r))
        row_r = row_r[order]
        lat_r, lon_r = lat_r[order], lon_r[order]
        keep = (np.abs(lat_r) <= MAX_LAT) & (np.abs(lon_r) <= 180.0)
        row_pos = row_r[keep]
        run_first = np.zeros(row_pos.size, dtype=np.int64)
        if row_pos.size:
            change = np.empty(row_pos.size, dtype=bool)
            change[0] = True
            change[1:] = row_pos[1:] != row_pos[:-1]
            firsts = np.flatnonzero(change)
            run_first = np.repeat(firsts, np.diff(np.concatenate([firsts, [row_pos.size]])))
        mention_idx = (np.arange(row_pos.size, dtype=np.int64) - run_first).astype(np.int32)
        return row_pos, mention_idx, lat_r[keep], lon_r[keep]

    def _py_scan_arrow(self, col):
        """Python-finditer scan over an Arrow string array's raw UTF-8
        buffer (NUL-joined, no Python strings): -> RAW match arrays
        (row_local, within_row_seq, lat, lon), unfiltered. Straggler
        fallback for parse_arrow and the reference implementation its
        property test compares against."""
        import pyarrow as pa
        n = len(col)
        empty = (np.empty(0, np.int64), np.empty(0, np.int64),
                 np.empty(0, np.float64), np.empty(0, np.float64))
        if n == 0:
            return empty
        # the raw-buffer walk below assumes utf8 with int32 offsets;
        # large_string (int64 offsets — pyarrow promotes for >2GB
        # columns, and parquet/Ray block layouts can produce it) and
        # any view types are normalized first, else the offsets buffer
        # is silently reinterpreted and mentions land on wrong rows
        if pa.types.is_large_string(col.type):
            offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
                col.offset:col.offset + n + 1]
        elif pa.types.is_string(col.type):
            offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
                col.offset:col.offset + n + 1].astype(np.int64)
        else:
            col = col.cast(pa.string())
            offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
                col.offset:col.offset + n + 1].astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        lens = np.diff(offs)
        out_starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens + 1, out=out_starts[1:])
        buf = np.zeros(int(out_starts[-1]), dtype=np.uint8)
        total = int(lens.sum())
        cum = np.cumsum(lens) - lens
        ar = np.arange(total, dtype=np.int64)
        buf[ar + np.repeat(out_starts[:-1] - cum, lens)] = \
            data[ar + np.repeat(offs[:-1] - cum, lens)]
        positions, groups = [], []
        for m in self.master_b.finditer(buf.tobytes()):
            positions.append(m.start())
            groups.append(m.groups())
        if not positions:
            return empty
        row_pos = np.searchsorted(out_starts, np.array(positions, dtype=np.int64),
                                  side="right") - 1
        g = np.array(groups, dtype=object)
        lat = np.empty(len(groups), dtype=np.float64)
        lon = np.empty(len(groups), dtype=np.float64)
        f1 = pd.notna(g[:, 0])
        f2 = pd.notna(g[:, 2])
        f3 = pd.notna(g[:, 4])
        lat[f1] = g[f1, 0].astype(np.float64)
        lon[f1] = g[f1, 1].astype(np.float64)
        lat[f2] = g[f2, 2].astype(np.float64)
        lon[f2] = g[f2, 3].astype(np.float64)
        lat[f3] = g[f3, 4].astype(np.float64) * np.where(g[f3, 5] == b"N", 1.0, -1.0)
        lon[f3] = g[f3, 6].astype(np.float64) * np.where(g[f3, 7] == b"E", 1.0, -1.0)
        # RAW within-row sequence (no range filter here — the caller
        # filters after merging with the RE2 rounds)
        run_first = np.zeros(row_pos.size, dtype=np.int64)
        if row_pos.size:
            change = np.empty(row_pos.size, dtype=bool)
            change[0] = True
            change[1:] = row_pos[1:] != row_pos[:-1]
            firsts = np.flatnonzero(change)
            run_first = np.repeat(firsts, np.diff(np.concatenate([firsts, [row_pos.size]])))
        seq = np.arange(row_pos.size, dtype=np.int64) - run_first
        return row_pos, seq, lat, lon

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """documents batch (url, text, ...) -> exploded mention rows
        (url, mention_idx, lon, lat)."""
        texts = batch["text"].reset_index(drop=True)
        urls = batch["url"].reset_index(drop=True).to_numpy()
        # prefilter: run the expensive master extractall only on docs
        # that can possibly contain a mention
        cand = texts.str.contains(self.prefilter, regex=True)
        if not cand.all():
            keep = np.flatnonzero(cand.to_numpy())
            texts = texts.iloc[keep].reset_index(drop=True)
            urls = urls[keep]
        parsed = self.parse_series(texts)
        return pd.DataFrame({
            "url": urls[parsed["row_pos"].to_numpy()],
            "mention_idx": parsed["mention_idx"].to_numpy(),
            "lon": parsed["lon"].to_numpy(),
            "lat": parsed["lat"].to_numpy(),
        })
