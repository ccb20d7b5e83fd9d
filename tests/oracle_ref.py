"""Independent single-process oracle implementing the reference fold literally.

Deliberately mirrors the *structure* of /root/reference/main.py (SegmentsGraph,
get_leaf_nodes, add_segment_to_graph) and /root/reference/segment.py
(Segment.intersect/minus/minus_union_of_segments with the verify guard), with
an in-memory geometry store standing in for the PostGIS ``geom`` table.  It is
coded independently of linked_maps_spark.fold so the two can cross-check each
other (SURVEY.md §5.2 item 1).
"""

from __future__ import annotations

import hashlib

from linked_maps_spark import geometry as G


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


class OracleSegment:
    def __init__(self, store, gid, name):
        self.store = store  # gid -> id-set (the "geom table")
        self.gid = gid
        self.name = name
        self.parents = {}
        self.children = {}

    def _op(self, result_ids, new_name):
        # G4 type guard: only non-empty MULTI* results inserted
        if not G.is_multi(result_ids):
            return None
        gid = len(self.store)
        self.store.append(result_ids)
        return OracleSegment(self.store, gid, new_name)

    def _verify(self, other):
        # segment.py:21-38
        return self is not other and self.name != other.name

    def intersect(self, other, new_name):
        if not self._verify(other):
            return None
        new_seg = self._op(G.intersect(self.store[self.gid], self.store[other.gid]), new_name)
        if new_seg:
            self.children[new_seg.gid] = new_seg
            other.children[new_seg.gid] = new_seg
            new_seg.parents[self.gid] = self
            new_seg.parents[other.gid] = other
        return new_seg

    def minus(self, other, new_name):
        if not self._verify(other):
            return None
        new_seg = self._op(G.difference(self.store[self.gid], self.store[other.gid]), new_name)
        if new_seg:
            self.children[new_seg.gid] = new_seg
            new_seg.parents[self.gid] = self
        return new_seg

    def minus_union_of_segments(self, list_of_gids, new_name):
        union = G.union_all([self.store[g] for g in list_of_gids])
        new_seg = self._op(G.difference(self.store[self.gid], union), new_name)
        if new_seg:
            self.children[new_seg.gid] = new_seg
            new_seg.parents[self.gid] = self
        return new_seg


class OracleGraph:
    """main.py:33-131, in memory."""

    def __init__(self, geom_type=G.LINE):
        self.sg = []
        self.store = []
        self.geom_type = geom_type

    def get_leaf_nodes(self):
        return [s for s in self.sg if len(s.children) == 0]

    def add_edition(self, name, wkt):
        ids = G.parse_wkt(wkt, self.geom_type)
        gid = len(self.store)
        self.store.append(ids)
        segment = OracleSegment(self.store, gid, name)

        leaves = self.get_leaf_nodes()
        self.sg.append(segment)
        list_of_leaf_gids = []
        for leaf_seg in leaves:
            int_seg = leaf_seg.intersect(
                segment, "i_" + _md5("i_%s_%s" % (leaf_seg.name, segment.name))
            )
            if int_seg:
                self.sg.append(int_seg)
                list_of_leaf_gids.append(int_seg.gid)
                leaf_min_int = leaf_seg.minus(
                    int_seg, "m_" + _md5("m_%s_%s" % (leaf_seg.name, int_seg.name))
                )
                if leaf_min_int:
                    self.sg.append(leaf_min_int)
        if list_of_leaf_gids:
            seg_min_union = segment.minus_union_of_segments(
                list_of_leaf_gids, "mu_" + _md5("mu_%s_UL" % segment.name)
            )
            if seg_min_union:
                self.sg.append(seg_min_union)

    # --- export views matching the engine's tables ---

    def segments(self):
        rows = []
        for s in self.sg:
            rows.append(
                {
                    "name": s.name,
                    "seq": s.gid,
                    "wkt": G.to_wkt(self.store[s.gid], self.geom_type),
                    "is_leaf": len(s.children) == 0,
                    "years": [s.name[:4]] if "_" not in s.name else [],
                }
            )
        return rows

    def relations(self):
        rows = []
        for s in self.sg:
            for child_gid in s.children:
                rows.append({"parent_name": s.name, "child_name": self.sg_name(child_gid)})
        return rows

    def sg_name(self, gid):
        for s in self.sg:
            if s.gid == gid:
                return s.name
        raise KeyError(gid)

    def editions_transitive(self):
        """generate_graph.py:52-54,73-75 — dates propagated down in creation order."""
        dates: dict[str, list[str]] = {}
        for s in self.sg:
            dates[s.name] = [s.name[:4]] if "_" not in s.name else []
        for s in self.sg:  # rel.jl is written in parent-creation order (main.py:77)
            for child_gid in s.children:
                cn = self.sg_name(child_gid)
                for d in dates[s.name]:
                    if d not in dates[cn]:
                        dates[cn].append(d)
        return dates
