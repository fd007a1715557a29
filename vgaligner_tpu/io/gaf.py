"""GAF (Graph Alignment Format) records and writers.

Behavioral reference: /root/reference/src/align.rs:726-1028
(GAFAlignment).  Column layout, `*` conventions, the chain path-matching
tuple format `(>node:offset,>node:offset),`, mapq saturation, and the
placeholder (unmapped) row are reproduced byte for byte.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from ..index.kmer_gen import FORWARD, REVERSE


@dataclass
class GAFAlignment:
    query_name: Optional[str] = None
    query_length: Optional[int] = None
    query_start: Optional[int] = None
    query_end: Optional[int] = None
    strand: Optional[str] = None
    path_matching: Optional[str] = None
    path_length: Optional[int] = None
    path_start: Optional[int] = None
    path_end: Optional[int] = None
    residue: Optional[int] = None
    alignment_block_length: Optional[int] = None
    mapping_quality: Optional[int] = None
    notes: Optional[str] = None

    def to_string(self) -> str:
        """align.rs:971-1027 — 13 tab-separated columns, '*' for missing,
        trailing newline."""
        fields = [
            self.query_name,
            self.query_length,
            self.query_start,
            self.query_end,
            self.strand,
            self.path_matching,
            self.path_length,
            self.path_start,
            self.path_end,
            self.residue,
            self.alignment_block_length,
            self.mapping_quality,
            self.notes,
        ]
        return "\t".join("*" if f is None else str(f) for f in fields) + "\n"

    # ---- constructors --------------------------------------------------

    _INT_COLS = frozenset(
        {"query_length", "query_start", "query_end", "path_length",
         "path_start", "path_end", "residue", "alignment_block_length",
         "mapping_quality"}
    )

    @classmethod
    def from_string(cls, line: str) -> "GAFAlignment":
        """Inverse of to_string: parse one GAF row back into a record
        ('*' -> None; round-trips byte-exactly).  Used by the multi-host
        merge, which gathers rows as strings over DCN."""
        cols = line.rstrip("\n").split("\t")
        names = [
            "query_name", "query_length", "query_start", "query_end",
            "strand", "path_matching", "path_length", "path_start",
            "path_end", "residue", "alignment_block_length",
            "mapping_quality", "notes",
        ]
        if len(cols) != len(names):
            raise ValueError(f"expected 13 GAF columns, got {len(cols)}")
        kw = {}
        for name, val in zip(names, cols):
            if val == "*":
                kw[name] = None
            elif name in cls._INT_COLS:
                kw[name] = int(val)
            else:
                kw[name] = val
        return cls(**kw)

    @classmethod
    def from_chain(cls, chain, index) -> "GAFAlignment":
        """align.rs:762-911 — chains GAF row.

        chain.anchors is the ascending (front..back) anchor list; each
        anchor contributes "(S,E)," where S/E are ">node:offset" or
        "<node:offset" derived from AnchorPosOnGraph (chain.rs:89-128).
        The chain's mapping_quality is the f64::MIN sentinel which the
        reference saturating-casts to 0 (align.rs:904).
        """
        assert not chain.is_placeholder
        import numpy as np

        n = chain.n_anchors
        pos = np.concatenate([chain.atb, chain.ate - 1])  # ends inclusive
        if chain.aso is None:
            orients = np.zeros(2 * n, dtype=np.int8)
        else:
            orients = np.concatenate([chain.aso, chain.aeo])
        ids, offs = _graph_pos_vectorized(index, orients, pos)
        parts: List[str] = []
        for i in range(n):
            s_sign = ">" if orients[i] == FORWARD else "<"
            e_sign = ">" if orients[n + i] == FORWARD else "<"
            parts.append(
                f"({s_sign}{ids[i]}:{offs[i]},{e_sign}{ids[n + i]}:{offs[n + i]}),"
            )
        return cls(
            query_name=chain.query.name,
            query_length=len(chain.query.seq),
            query_start=int(chain.aqb[0]),
            query_end=int(chain.aqb[-1]) + chain.k,
            strand="+",
            path_matching="".join(parts),
            path_length=0,
            path_start=0,
            path_end=0,
            residue=0,
            alignment_block_length=0,
            # min(mapq as u64, 254), align.rs:904 — the f64::MIN sentinel
            # saturates to 0; the opt-in --mapq extension sets 0/60
            mapping_quality=min(int(max(chain.mapping_quality, 0.0)), 254),
            notes=f"ta:Z:chain,n_anchors: {n}",
        )

    @classmethod
    def from_abpoa_result(cls, res, chain, range_handles) -> "GAFAlignment":
        """align.rs:1096-1168 (generate_alignment) — base-level GAF from
        the global POA result.  The subgraph node path is mapped back to
        original handles via the range handle list; notes carry
        'as:i:-30 <cs>,cg:Z:<cigar>' and mapq is 255."""
        from ..graph.handlegraph import handle_id, handle_is_reverse

        parts = []
        for node_idx in res.node_path:
            h = range_handles[node_idx]
            sign = "<" if handle_is_reverse(h) else ">"
            parts.append(f"{sign}{handle_id(h)}")
        return cls(
            query_name=chain.query.name,
            query_length=res.query_end - res.query_start,
            query_start=res.query_start,
            query_end=res.query_end,
            strand="+",
            path_matching="".join(parts),
            path_length=len(res.path_vertices),
            path_start=res.aln_start_offset,
            path_end=res.aln_end_offset,
            residue=0,
            alignment_block_length=res.n_aligned,
            mapping_quality=255,
            notes="as:i:-30 " + res.cs + ",cg:Z:" + res.cigar,
        )

    @classmethod
    def from_rspoa_result(cls, res, chain, range_handles) -> "GAFAlignment":
        """align.rs:932-969 (from_rspoa_alignment) — local no-gap GAF."""
        from ..graph.handlegraph import handle_id, handle_is_reverse

        parts = []
        for node_idx in res.node_path:
            h = range_handles[node_idx]
            sign = "<" if handle_is_reverse(h) else ">"
            parts.append(f"{sign}{handle_id(h)}")
        return cls(
            query_name=chain.query.name,
            query_length=len(chain.query.seq),
            query_start=res.query_start,
            query_end=res.query_end,
            strand="+",
            path_matching="".join(parts),
            path_length=len(res.path_vertices),
            path_start=res.path_start_offset,
            path_end=res.path_end_offset,
            residue=res.residue_matches,
            alignment_block_length=0,
            mapping_quality=255,
            notes=res.cs + ",cg:Z:" + res.cigar,
        )

    @classmethod
    def from_placeholder_chain(cls, chain) -> "GAFAlignment":
        """align.rs:913-930 — the unmapped-read row."""
        assert chain.is_placeholder
        return cls(
            query_name=chain.query.name,
            query_length=len(chain.query.seq),
            mapping_quality=0,
        )


def _graph_pos_vectorized(index, orients, pos):
    """Vectorized AnchorPosOnGraph::new (chain.rs:89-128)."""
    return index.node_ids_from_seqpos_vec(orients, pos)


def write_gaf_to_file(alignments: List[GAFAlignment], file_name: str) -> None:
    """map.rs:219-226."""
    with open(file_name, "w") as fh:
        fh.write("".join(a.to_string() for a in alignments))
