"""Bundled sample datasets (Torrence & Compo analysis workloads).

Counterpart to the reference's ``pycwt/sample/dataset.py`` class (reference
``sample/dataset.py:22-135``), redesigned as a frozen record + loader over
``.npz`` files (the classic datasets — NINO3 SST, Mauna Loa CO₂, All-India
monsoon rainfall, Wolf sunspot numbers, SOI, Arctic Oscillation, Baltic sea
ice — repackaged from their published plain-text forms).
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")

#: metadata matching the reference Dataset registry (sample/dataset.py:60-135)
_REGISTRY = {
    "nino3": dict(label="NINO3 SST", units="degC"),
    "mauna": dict(label="Mauna Loa CO2", units="ppm"),
    "monsoon": dict(label="All-India monsoon rainfall", units="mm"),
    "sunspots": dict(label="Wolf's sunspot number", units="count"),
    "soi": dict(label="Southern Oscillation Index", units="mb"),
    "jao": dict(label="Arctic Oscillation", units=""),
    "jbaltic": dict(label="Baltic maximum sea ice extent", units=""),
}


@dataclasses.dataclass(frozen=True)
class Dataset:
    name: str
    values: np.ndarray
    t0: float
    dt: float
    label: str
    units: str

    @property
    def time(self) -> np.ndarray:
        return self.t0 + np.arange(len(self.values)) * self.dt

    def standardized(self) -> np.ndarray:
        """Zero-mean, unit-std series (the canonical preprocessing of the
        sample scripts, reference ``sample/sample.py:51-57``)."""
        v = self.values
        return (v - v.mean()) / v.std()


def list_datasets() -> list[str]:
    return sorted(_REGISTRY)


def load(name: str) -> Dataset:
    """Load a bundled dataset by name (see :func:`list_datasets`)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown dataset {name!r}; available: {list_datasets()}")
    path = os.path.join(_DATA_DIR, f"{name}.npz")
    with np.load(path) as z:
        values = z["values"]
        t0 = float(z["t0"])
        dt = float(z["dt"])
    meta = _REGISTRY[name]
    return Dataset(name=name, values=values, t0=t0, dt=dt,
                   label=meta["label"], units=meta["units"])
