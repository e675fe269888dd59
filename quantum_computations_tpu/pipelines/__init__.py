"""Research pipelines (thin drivers over the engines).

Parity targets (reference `impact_of_finite_squeezing_...` and
`performance_analysis_of_gkp_error_correction`):

- :mod:`.circuits`  — DV circuit builders (Grover, oracles, CCZ) and CV snippets
- :mod:`.grover`    — GKP Grover sweep producing ``gkp_grover_*.dat`` schemas
- :mod:`.rb`        — randomised benchmarking producing ``gkp_rb.dat`` schema
- :mod:`.clifford_fidelity` — Clifford-encoding fidelity (``gkp_cliff.dat``)
- :mod:`.tomography` — process tomography toolbox
- :mod:`.gkp_ec`    — GKP error-correction projectors and logical fidelity
"""
