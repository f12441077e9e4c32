"""Plain-text and JSONL sources/sinks — the reference's non-parquet I/O.

- ``read_seed_list``: the reference reads its start URL from stdin and
  defaults the scheme to https (main.go:50-66); batch jobs feed it a
  text file of URLs. This reads such a file (one URL per line, ``#``
  comments and blanks skipped) and applies the SAME validation the
  pinned simulator's ``validate_seed`` applies, preserving input order
  and dropping invalid lines.
- ``read_jsonl`` / ``write_jsonl``: newline-delimited JSON for the
  ``documents``-shaped tables — the interchange format most external
  text-pipeline tooling speaks. Reading uses Ray's native ``read_json``
  (arrow JSON reader per block — vectorized, not per-row Python);
  writing streams per-block files via ``Dataset.write_json`` so output
  stays partitioned/resumable like every other sink here.
"""

from __future__ import annotations

import ray.data as rd

from ..oracle.crawl_sim import validate_seed


def read_seed_list(path: str) -> list[str]:
    """Validated seed URLs from a one-per-line text file (order kept,
    invalid lines dropped — main.go:58-66 semantics via the shared
    ``validate_seed`` spec). Seed lists are driver-small by definition
    (the frontier explodes AFTER fetch), so this is a plain file read."""
    out: list[str] = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            v = validate_seed(s)
            if v is not None:
                out.append(v)
    return out


def read_jsonl(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Documents-shaped Dataset from newline-delimited JSON file(s)."""
    ds = rd.read_json(path)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl(ds: rd.Dataset, out_dir: str) -> None:
    """Partitioned JSONL output (one file per block — resumable layout,
    never one giant file)."""
    ds.write_json(out_dir)


def read_csv_table(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """CSV source (Ray's native arrow CSV reader — vectorized per block)."""
    ds = rd.read_csv(path)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def write_csv(ds: rd.Dataset, out_dir: str) -> None:
    """Partitioned CSV output (one file per block, same resumable layout
    as the JSONL and parquet sinks)."""
    ds.write_csv(out_dir)
