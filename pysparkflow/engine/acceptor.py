"""Driver-side greedy augmenting-path acceptance (D8).

The reference serializes path acceptance: ff1 runs it inline at the single
SINK reducer (ff1/Excess.java:265-305 ``AugmentingPaths.accept``); ff2+ move
it to a one-thread queue consumer in an external RMI "ApServer"
(ff2/Augmenter.java:12-43, ff2/ApServer.java:26-48). Spark-first, the driver
*is* the global coordinator: candidate paths collected per phase are small
(pruned frontiers, paths of tens of edges), so a plain Python loop replaces
the RMI process entirely (SURVEY.md §2.2 D8/D17).

Candidates arrive as vertex walks with per-arc residual snapshots taken at
phase start. Acceptance:
  1. loop-erase the spliced S++T walk into a simple path (the reference
     "removes cycles by backtracking to the first repeated vertex",
     ff1/Vertex.java:298-318 / ff1/Excess.java:48-68);
  2. bottleneck = min over arcs of (snapshot residual - net delta already
     pushed on that arc this phase) — the two-phase check/perform of
     ff1/Excess.java:265-305;
  3. accept if bottleneck > 0; record signed deltas on both arc directions.
"""

from __future__ import annotations

from collections import defaultdict


def loop_erase(walk: list[int]) -> list[int]:
    """Erase loops from a vertex walk, yielding a simple path with the same
    endpoints. Every arc of the result is an arc of the walk, so positive
    walk residuals imply positive path residuals."""
    pos: dict[int, int] = {}
    out: list[int] = []
    for vtx in walk:
        if vtx in pos:
            del_from = pos[vtx] + 1
            for dropped in out[del_from:]:
                pos.pop(dropped, None)
            del out[del_from:]
        else:
            out.append(vtx)
            pos[vtx] = len(out) - 1
    return out


class GreedyAcceptor:
    """Accumulates accepted flow across one phase.

    ``residual`` maps directed arc (x, y) -> residual snapshot at phase
    start; ``delta`` maps arc -> net flow pushed this phase. Residual of an
    arc during the phase is ``residual[arc] - delta[arc]`` (pushing on the
    reverse arc makes delta negative, i.e. frees capacity — the signed-flow
    cancellation of ff2/Edge.java:29-33).
    """

    def __init__(self) -> None:
        self.residual: dict[tuple[int, int], int] = {}
        self.delta: dict[tuple[int, int], int] = defaultdict(int)
        self.accepted_flow = 0
        self.accepted_paths: list[tuple[list[int], int]] = []

    def observe_arcs(self, arcs: list[tuple[int, int, int]]) -> None:
        """Record (x, y, residual_snapshot) triples from a candidate path.
        Snapshots are consistent within a phase, so first-seen wins."""
        for x, y, res in arcs:
            self.residual.setdefault((int(x), int(y)), int(res))

    def try_accept(self, walk: list[int]) -> int:
        """Loop-erase ``walk`` and greedily accept it against the running
        residuals. Returns the accepted bottleneck (0 if rejected)."""
        path = loop_erase(walk)
        if len(path) < 2:
            return 0
        arcs = list(zip(path, path[1:]))
        bottleneck = None
        for arc in arcs:
            if arc not in self.residual:
                # Arc survived loop-erasure but its residual was never
                # observed — cannot prove capacity; reject conservatively.
                return 0
            avail = self.residual[arc] - self.delta[arc]
            bottleneck = avail if bottleneck is None else min(bottleneck, avail)
            if bottleneck <= 0:
                return 0
        assert bottleneck is not None
        for x, y in arcs:
            self.delta[(x, y)] += bottleneck
            self.delta[(y, x)] -= bottleneck
        self.accepted_flow += bottleneck
        self.accepted_paths.append((path, bottleneck))
        return bottleneck

    def flow_deltas(self) -> list[tuple[int, int, int]]:
        """Canonical (u, v, signed_delta) rows with u < v, for joining back
        onto the flows table. Only one canonical row per undirected edge."""
        out = []
        for (x, y), d in self.delta.items():
            if x < y and d != 0:
                out.append((x, y, d))
        return out
