"""Integration pipelines.

``motogp`` reproduces the reference's Kettle transformation
(``motogp.ktr``, 132 steps) as seven Spark-first table builders —
SURVEY.md §1.4 / §3.1 is the blueprint, with every hand-inserted sort,
per-step thread, and DB sequence replaced by declarative DataFrame plans
Catalyst can optimize.
"""
