"""Relational operator builders (SURVEY §2.B-2.G, §2.K).

Each function takes/returns DataFrames so plans stay declarative and
Catalyst-optimizable; the only imperative island is MMR (ranking.py),
which is sequential by definition and runs over a collected ≤200-row set
(SURVEY §4.3.2).
"""
