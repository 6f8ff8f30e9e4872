"""Contact-semantics datasets for POSA / ContactFormer training
(reference ``ProxDataset_ds``, ``posa/dataset.py:268-346``).

Disk layout:
  <data_dir>/vertices_can/<seq>verts_can.npy   (T, 655, 3) canonical verts
  <data_dir>/vertices/<seq>verts.npy           (T, 655, 3) world verts
  <data_dir>/semantics/<seq>cfs.npy            (T, 655) int contact classes

__getitem__ returns ``(verts_can (max_frame, 655, 3), contacts one-hot
(max_frame, 655, C), mask (max_frame,))`` — a random window with
jump_step frame skipping, zero-padded to max_frame.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from lsdm_tpu.data.npy_native import load as load_npy
from lsdm_tpu.ops.geometry import normalize_orientation


class ProxContactDataset:
    def __init__(
        self,
        data_dir: str,
        fix_orientation: bool = False,
        no_obj_classes: int = 8,
        max_frame: int = 220,
        jump_step: int = 8,
        step_multiplier: int = 1,
        ds_weights_path: Optional[str] = None,
        seed: int = 0,
        **_,
    ):
        self.data_dir = data_dir
        self.contacts_dir = os.path.join(data_dir, "semantics")
        self.verts_can_dir = os.path.join(data_dir, "vertices_can")
        self.verts_dir = os.path.join(data_dir, "vertices")
        self.seq_names = sorted(
            f.split("cfs")[0] for f in os.listdir(self.contacts_dir)
        )
        self.no_obj_classes = no_obj_classes
        self.max_frame = max_frame
        self.jump_step = jump_step
        self.step_multiplier = step_multiplier
        self.fix_orientation = fix_orientation
        self._rng = np.random.RandomState(seed)

        self.verts_can = {}
        self.contacts = {}
        self.total_frames = 0
        for seq in self.seq_names:
            self.verts_can[seq] = load_npy(
                os.path.join(self.verts_can_dir, seq + "verts_can.npy")
            ).astype(np.float32)
            self.contacts[seq] = load_npy(
                os.path.join(self.contacts_dir, seq + "cfs.npy")
            ).astype(np.int32)
            self.total_frames += self.verts_can[seq].shape[0]

        self.associated_joints = None
        if fix_orientation and ds_weights_path and os.path.exists(ds_weights_path):
            w = np.load(ds_weights_path)
            self.associated_joints = np.argmax(w, axis=1)

    def __len__(self) -> int:
        return max(self.step_multiplier * self.total_frames // self.max_frame, 1)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        seq = self.seq_names[self._rng.randint(len(self.seq_names))]
        verts_can = self.verts_can[seq]
        contacts = self.contacts[seq]
        T = verts_can.shape[0]

        if self.max_frame * self.jump_step > T:
            start = self._rng.randint(self.jump_step)
            end = T
        else:
            start = self._rng.randint(T - self.max_frame * self.jump_step)
            end = start + self.max_frame * self.jump_step

        vc = verts_can[start : end : self.jump_step]
        if self.fix_orientation and self.associated_joints is not None:
            import jax.numpy as jnp

            vc = np.asarray(normalize_orientation(jnp.asarray(vc),
                                                  self.associated_joints))
        cs = contacts[start : end : self.jump_step]
        onehot = np.eye(self.no_obj_classes, dtype=np.float32)[
            np.clip(cs, 0, self.no_obj_classes - 1)
        ]

        seg = vc.shape[0]
        mask = np.zeros(self.max_frame, np.float32)
        mask[:seg] = 1
        vc_pad = np.zeros((self.max_frame, *vc.shape[1:]), np.float32)
        vc_pad[:seg] = vc
        cs_pad = np.zeros((self.max_frame, *onehot.shape[1:]), np.float32)
        cs_pad[:seg] = onehot
        return vc_pad, cs_pad, mask
