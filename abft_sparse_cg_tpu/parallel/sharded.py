"""Mesh-sharded CG: 1-D row sharding over a jax.sharding.Mesh.

The reference is strictly single-node (no MPI/NCCL anywhere — SURVEY §2);
this is the TPU-native scaling axis it lacks.  Design (GSPMD):

  - exec planes ``(K, R)``/``(D, R)`` and all vectors ``(R,)`` are
    sharded along rows of a 1-D ``("shard",)`` mesh (``R`` padded to a
    multiple of 8 * n_devices so shards stay sublane-aligned; rows are
    the lane axis of every plane);
  - the solve is the *same* single-device program (``ops.spmv`` +
    ``solver.cg``) jitted with sharding annotations: XLA's SPMD
    partitioner inserts the one all-gather CG needs (the SpMV reads
    off-shard entries of p) and psums for the dot/argmax/sum reductions
    — exactly the two collectives SURVEY §5 calls for, riding ICI;
  - per-shard ABFT verification is purely local; error/correction
    reductions fold in with the same automatic collectives.

Faults, detection, correction and the stdout contract are identical to
the single-device path because it *is* the same program.
"""

from __future__ import annotations

import numpy as np

from ..formats.protected import ProtectedMatrix
from ..ops.spmv import make_spmv
from ..solver.cg import make_cg_solver

__all__ = ["default_mesh", "pad_rows", "make_sharded_solver", "solve_sharded"]


def default_mesh(n_devices=None, axis="shard"):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def pad_rows(arr: np.ndarray, R_pad: int, axis: int = 0):
    pad = R_pad - arr.shape[axis]
    if pad == 0:
        return arr
    width = [(0, 0)] * arr.ndim
    width[axis] = (0, pad)
    return np.pad(arr, width)


def _device_put_sharded(mat: ProtectedMatrix, b: np.ndarray, mesh, dtype):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mat.exec_kind in ("flat", "split"):
        raise ValueError(
            f"the {mat.exec_kind} (bordered-matrix) layout cannot be "
            "row-sharded yet — its planes are not purely per-row; use a "
            "single device for dense-row matrices"
        )
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]
    R_pad = -(-mat.R // (8 * ndev)) * (8 * ndev)

    # Execution planes are (K, rows) / (D, rows): rows live on the lane
    # dimension for both layouts -> shard dim 1.
    ra = mat.exec_row_axis
    row2d = NamedSharding(mesh, P(None, axis))
    row1d = NamedSharding(mesh, P(axis))

    from ..ops.spmv import MatrixDevice

    padded = {n: pad_rows(mat.ell[n], R_pad, ra) for n in mat.layout.word_names}
    words = tuple(
        jax.device_put(padded[n], row2d) for n in mat.layout.word_names
    )
    ell_len = jax.device_put(pad_rows(mat.ell_len, R_pad), row1d)
    # Build-time checksums, zero-padded to the mesh-padded row count
    # (zero blocks checksum to zero) and sharded like the rows.
    cksum = jax.device_put(
        pad_rows(mat.ell_cksum, R_pad // 8, axis=1),
        NamedSharding(mesh, P(None, axis)),
    )
    from ..ecc.values import planes_to_value

    names = mat.layout.word_names
    values = planes_to_value(
        words[names.index("value_lo")], words[names.index("value_hi")], dtype
    )
    gidx = perm_pos = None
    if mat.perm is not None and mat.exec_kind == "ell":
        from ..formats.reorder import inverse_permutation
        from ..ops.spmv import exec_gather_host

        gidx = jax.device_put(pad_rows(exec_gather_host(mat), R_pad, 1),
                              row2d)
        pp = np.zeros(R_pad, dtype=np.int32)
        pp[: mat.N] = inverse_permutation(mat.perm)
        perm_pos = jax.device_put(pp, row1d)
    md = MatrixDevice(words=words, ell_len=ell_len, cksum=cksum,
                      values=values, gidx=gidx, perm_pos=perm_pos)

    def put_vec(v):
        """Canonical (N,) host vector -> exec-order, padded, row-sharded."""
        vpad = np.zeros(R_pad, dtype=np.float64)
        vpad[: mat.N] = mat.to_exec_order(v)
        return jax.device_put(jnp.asarray(vpad, dtype=dtype), row1d)

    return md, put_vec(b), put_vec


def make_sharded_solver(mat: ProtectedMatrix, mesh, max_itrs: int,
                        conv_threshold: float, dtype):
    """Jitted sharded solve(md, b) for this matrix config."""
    import jax

    spmv = make_spmv(mat, dtype)
    solver = make_cg_solver(spmv, max_itrs, conv_threshold)
    return jax.jit(solver)


def solve_sharded(mat: ProtectedMatrix, b: np.ndarray, max_itrs: int,
                  conv_threshold: float, mesh=None, dtype=None):
    """Row-sharded CG over all (or the given mesh's) devices.

    ``b`` is in canonical order; the returned ``CGResult.x`` is in
    execution order (map back with ``mat.from_exec_order`` after
    stripping the mesh padding) — identical unless the matrix was built
    with an RCM reordering.
    """
    import jax.numpy as jnp

    if mesh is None:
        mesh = default_mesh()
    dtype = dtype or jnp.float32
    md, bdev, _ = _device_put_sharded(mat, b, mesh, dtype)
    solver = make_sharded_solver(mat, mesh, max_itrs, conv_threshold, dtype)
    return solver(md, bdev)
