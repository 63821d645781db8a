"""Core data model: Model/Data pytrees, enums, spatial math."""

from ambersim_tpu.core.types import (  # noqa: F401
    BiasType,
    ConeType,
    Contact,
    Data,
    DisableBit,
    DynType,
    EnableBit,
    EqType,
    GainType,
    GeomType,
    IntegratorType,
    JointType,
    Model,
    Option,
    SolverType,
    TrnType,
)
