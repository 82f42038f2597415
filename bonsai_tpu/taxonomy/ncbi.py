"""NCBI taxonomy file parsing (host side).

Equivalents of build_parent_map (/root/reference/include/bonsai/util.h:766-785),
build_name_hash (util.h:693-722) and get_taxid's accession extraction
(util.h:898-929).
"""

from __future__ import annotations

import gzip
from typing import Dict


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path)


def parse_nodes_dmp(path: str) -> Dict[int, int]:
    """nodes.dmp -> {taxid: parent}.  Matches build_parent_map: taxid from
    the line start, parent from two chars past the first '|'; root 1 -> 0."""
    out: Dict[int, int] = {}
    with _open(path) as fh:
        for line in fh:
            if not line or line[0] in "\n\0#":
                continue
            try:
                tid = int(line.split("\t", 1)[0].split("|", 1)[0])
            except ValueError:
                continue
            bar = line.find("|")
            parent = int(line[bar + 2 :].split("\t", 1)[0].split("|", 1)[0]) if bar >= 0 else 0xFFFFFFFF
            out[tid] = parent
    out[1] = 0
    if len(out) < 2:
        raise ValueError(f"failed to parse taxonomy from {path}")
    return out


def parse_nameid_map(path: str) -> Dict[str, int]:
    """Two-column name<TAB>taxid file -> {name: taxid} (build_name_hash).
    Later duplicate keys overwrite earlier ones (util.h:703-711)."""
    out: Dict[str, int] = {}
    with _open(path) as fh:
        for line in fh:
            if not line or line[0] in "\n\0#":
                continue
            tab = line.find("\t")
            if tab < 0:
                name, val = line.rstrip("\n"), ""
            else:
                name, val = line[:tab], line[tab + 1 :]
            try:
                out[name] = int(val.strip() or 0)
            except ValueError:
                out[name] = 0
    return out


def accession_from_header(header: str) -> str:
    """Extract the lookup key from a FASTA header line (util.h:909-921).

    header: the full first line including '>' or not.  With '|' separators
    the field between the last two '|'s is used (">gi|5|ref|NC_1.1| d" ->
    "NC_1.1"); otherwise the first whitespace-delimited token.
    """
    line = header[1:] if header.startswith(">") else header
    if "|" in line:
        last = line.rfind("|")
        prev = line.rfind("|", 0, last)
        return line[prev + 1 : last]
    for i, ch in enumerate(line):
        if ch.isspace():
            return line[:i]
    return line


def taxid_for_path(path: str, name_map: Dict[str, int]) -> int:
    """First-header accession -> taxid; missing -> 1 (util.h:922)."""
    import gzip as _gz

    opener = _gz.open if path.endswith(".gz") else open
    with opener(path, "rt") as fh:
        first = fh.readline()
    acc = accession_from_header(first.strip())
    return name_map.get(acc, 1)
