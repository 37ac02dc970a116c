"""Experiment configs -- each module exports ``config() -> ExperimentConfig``.

Capability match for the reference's scripts/config/ package (20 modules);
ablation variants flip exactly one knob off the shipped GrooMeD-NMS run,
mirroring the paper's ablation table.
"""
