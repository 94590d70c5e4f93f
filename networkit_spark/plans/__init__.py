"""Plans: the driver-side iteration runtime.

Catalyst plans each superstep; what it cannot plan is the *iteration* —
convergence loops, frontier/delta maintenance, lineage truncation, and
mid-run resume. ``iteration.py`` provides that runtime (the analog of the
reference's ``Algorithm::run()`` while-loops, e.g. ``PageRank.cpp:66-96``),
with per-iteration state + metrics persisted so runs resume mid-iteration.
"""
