"""Device-mesh sharding for sector-scale searches.

The reference has no distributed layer (SURVEY.md §2.3); this module is
the new first-class equivalent: a ``(targets, grid)`` mesh where the
target batch is data-parallel and the period/frequency grid — the large,
embarrassingly parallel axis (SURVEY.md §5 "grid-sharding component") —
is sharded across chips via ``shard_map``.  Both axes need zero
collectives for the power computation itself; cross-shard reductions
(per-target argmax over the full grid) ride ICI as tiny ``psum``-style
all-gathers on the (B,) best-so-far arrays.
"""
from .grid import (make_mesh, sharded_bls, sharded_lombscargle,
                   best_candidates)

__all__ = ["make_mesh", "sharded_bls", "sharded_lombscargle",
           "best_candidates"]
