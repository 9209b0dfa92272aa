"""Spill: device (HBM) -> host (RAM / disk) offload of relations.

Capability analog of the reference's SpillManager
(physical-plan/src/spill/spill_manager.rs:40) + DiskManager
(execution/src/disk_manager.rs:192): on TPU the first spill tier is host RAM
(HBM->host transfer replaces Arrow-IPC temp files), with an optional disk
tier (numpy .npz) for host-memory pressure."""
from __future__ import annotations

import os
import tempfile
from typing import Dict, List, Optional

import jax
import numpy as np

from ..common.schema import Schema
from ..data.column import HostColumn
from ..data.device import DeviceColumn, DeviceRelation
from ..data.table import Table


class SpilledRelation:
    """A relation moved off-device (host arrays, optionally a disk file)."""

    def __init__(self, schema: Schema, arrays: Dict[str, np.ndarray],
                 meta: List[tuple], path: Optional[str] = None):
        self.schema = schema
        self.arrays = arrays
        self.meta = meta  # (dtype, dictionary, has_validity) per column
        self.path = path

    @property
    def nbytes(self) -> int:
        return sum(a.nbytes for a in self.arrays.values())

    def to_disk(self, directory: Optional[str] = None,
                compress: bool = False) -> str:
        fd, path = tempfile.mkstemp(suffix=".npz", dir=directory)
        os.close(fd)
        # compression trades CPU for disk bandwidth (reference:
        # spill_compression, spill/mod.rs:240-256 lz4/zstd IPC writers)
        (np.savez_compressed if compress else np.savez)(path, **self.arrays)
        self.arrays = {}
        self.path = path
        return path

    def _load(self) -> Dict[str, np.ndarray]:
        if self.path is not None and not self.arrays:
            with np.load(self.path) as z:
                self.arrays = {k: z[k] for k in z.files}
        return self.arrays

    def restore(self, device=None) -> DeviceRelation:
        arrays = self._load()
        cols = []
        for i, (dtype, dictionary, has_validity) in enumerate(self.meta):
            data = jax.numpy.asarray(arrays[f"c{i}"])
            validity = jax.numpy.asarray(arrays[f"v{i}"]) if has_validity else None
            cols.append(DeviceColumn(data, validity, dtype, dictionary))
        rel = DeviceRelation(self.schema, tuple(cols), jax.numpy.asarray(arrays["sel"]))
        if device is not None:
            rel = jax.device_put(rel, device)
        return rel

    def release(self):
        self.arrays = {}
        if self.path and os.path.exists(self.path):
            os.unlink(self.path)


class SpillManager:
    def __init__(self, directory: Optional[str] = None,
                 max_host_bytes: int = 0, compress: bool = False):
        self.directory = directory
        self.max_host_bytes = int(max_host_bytes or 0)
        self.compress = bool(compress)
        self.spilled: List[SpilledRelation] = []
        self.spill_count = 0
        self.spilled_bytes = 0
        self.disk_spill_count = 0

    def _enforce_host_budget(self) -> None:
        """Demote the oldest host-RAM spills to disk once the host tier
        exceeds its budget (the disk rung of the HBM->host->disk ladder;
        reference: DiskManager temp files, execution/src/disk_manager.rs:192)."""
        if not self.max_host_bytes or not self.directory:
            return
        host = sum(s.nbytes for s in self.spilled if s.path is None)
        for s in self.spilled:
            if host <= self.max_host_bytes:
                break
            if s.path is None:
                n = s.nbytes
                s.to_disk(self.directory, compress=self.compress)
                self.disk_spill_count += 1
                host -= n

    def record_offload(self, nbytes: int) -> None:
        """Account a device->host offload whose host copy is managed by the
        caller (external sort / host-distinct runs: the chunk leaves HBM to be
        merged host-side later -- the ExternalSorter spill pattern,
        sorts/sort.rs:210 -- but lives on as a host Table, not an .npz)."""
        self.spill_count += 1
        self.spilled_bytes += int(nbytes)

    def spill(self, rel: DeviceRelation) -> SpilledRelation:
        arrays = {"sel": np.asarray(rel.sel)}
        meta = []
        for i, c in enumerate(rel.columns):
            arrays[f"c{i}"] = np.asarray(c.data)
            if c.validity is not None:
                arrays[f"v{i}"] = np.asarray(c.validity)
            meta.append((c.dtype, c.dictionary, c.validity is not None))
        s = SpilledRelation(rel.schema, arrays, meta)
        self.spilled.append(s)
        self.spill_count += 1
        self.spilled_bytes += s.nbytes
        self._enforce_host_budget()
        return s
