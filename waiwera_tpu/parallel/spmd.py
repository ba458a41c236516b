"""shard_map execution of the nonlinear timestep over a device mesh.

The single-device System/newton_solve/krylov stack runs unchanged on
domain-decomposed arrays: LocalSystem overrides the parallel hooks
(System.interior_mask/sync/reduce_*) with XLA collectives, and
DistributedSystem builds the per-device static data (local mesh, BSR
structure, halo routing) on host and wires the whole Newton step
through jax.shard_map.

Mapping to the reference: a device = an MPI rank; to_local =
DMGlobalToLocal scatter; sync = PetscSF halo exchange; the psum/pmax
reductions = the Vec norm / allreduce calls inside SNES/KSP
(dm_utils.F90:644, mpi_utils.F90:37-56).

Current scope: full Newton + BiCGStab/GMRES + transitions with simple
sources (per-source rate/enthalpy/deliverability). Source networks with
groups/reinjectors aggregate flows across sources, which needs a
gather of source-cell states; they are rejected here for now.
Preconditioners: bjacobi / none (additive-Schwarz DILU needs the
per-device split tables plumbed through; the local DILU would then act
as overlap-1 ASM exactly like the reference default).
"""

from __future__ import annotations

import copy
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P

from waiwera_tpu.mesh.device import MeshArrays
from waiwera_tpu.ops import ell as ops_ell
from waiwera_tpu.parallel.partition import PartitionPlan, build_partition
from waiwera_tpu.physics.state import RockState
from waiwera_tpu.solver import bsr
from waiwera_tpu.solver.bsr import BSRStructure
from waiwera_tpu.solver.newton import NewtonParams, newton_solve
from waiwera_tpu.solver.system import MethodCoeffs, System

Array = jnp.ndarray

AXIS = "part"


class LocalSystem(System):
    """System on one device's local cells (owned + halo), with the
    parallel hooks implemented as collectives over the mesh axis."""

    def __init__(
        self,
        eos,
        mesh_local: MeshArrays,
        network,
        structure: BSRStructure,
        ell_struct: ops_ell.ELLStructure,
        pos_lr: Array,
        pos_rl: Array,
        owned: Array,
        send_idx: Array,
        recv_src: Array,
        n_owned_pad: int,
        axis: str = AXIS,
    ):
        # no super().__init__: structure is prebuilt per device on host
        self.eos = eos
        self.mesh = mesh_local
        self.network = network
        self.npv = eos.num_primary_variables
        self.isothermal = eos.isothermal
        self.structure = structure
        self.ell = ell_struct
        self.pos_lr = pos_lr
        self.pos_rl = pos_rl
        self.owned = owned
        self.send_idx = send_idx
        self.recv_src = recv_src
        self.n_owned_pad = n_owned_pad
        self.axis = axis

    # -- parallel hooks ----------------------------------------------

    @property
    def interior_mask(self) -> Array:
        return self.owned & ~self.mesh.is_ghost

    @property
    def update_mask(self) -> Array:
        # halo copies of remote interior cells update locally (same
        # pure per-cell transition on synced inputs as on their owner)
        return ~self.mesh.is_ghost

    def reduce_sum(self, x: Array) -> Array:
        return lax.psum(x, self.axis)

    def reduce_max(self, x: Array) -> Array:
        return lax.pmax(x, self.axis)

    def reduce_any(self, x: Array) -> Array:
        return lax.pmax(x.astype(jnp.int32), self.axis) > 0

    def sync(self, x):
        """Overlap-1 halo exchange: pack boundary cells, all_gather
        over the mesh axis, pull this device's halo slots out of the
        gathered buffer."""

        def ex(a):
            send = a[self.send_idx]
            gathered = lax.all_gather(send, self.axis)  # [D, S, ...]
            flat = gathered.reshape((-1,) + a.shape[1:])
            halo = flat[self.recv_src]
            return a.at[self.n_owned_pad :].set(halo)

        return jax.tree_util.tree_map(ex, x)

    def make_matvec(self, mat, dtype=None):
        m = ops_ell.to_ell(mat, self.ell, dtype)

        def mv(x):
            y = m.matvec(self.sync(x))
            return jnp.where(self.owned[:, None], y, 0.0)

        return mv

    def make_linear_operator(self, mat, pc_name, dtype=None, sweeps=3):
        """Distributed variant: ELL matvec with halo sync; the
        preconditioner acts on the local rows only (block-Jacobi at
        device granularity, like the reference's bjacobi default)."""
        from waiwera_tpu.solver import precond as _precond

        mv = self.make_matvec(mat, dtype)
        name = (
            pc_name if pc_name in ("bjacobi", "jacobi", "none")
            else "bjacobi"
        )
        pc = _precond.make_preconditioner(
            name, mat, sweeps=sweeps, dtype=dtype
        )
        return mv, pc

    # -- row masking: only owned rows count --------------------------

    def residual(self, y, region, rock, coeffs, t0, t1):
        r, L, fluxes, err = super().residual(y, region, rock, coeffs, t0, t1)
        r = jnp.where(self.owned[:, None], r, 0.0)
        return r, L, fluxes, err

    def residual_and_jacobian(
        self, y, region, rock, coeffs, t0, t1, tangent_dtype=None
    ):
        r, L, fluxes, err, mat = super().residual_and_jacobian(
            y, region, rock, coeffs, t0, t1, tangent_dtype=tangent_dtype
        )
        r = jnp.where(self.owned[:, None], r, 0.0)
        # halo/pad rows -> identity so the local preconditioner stays
        # well-defined; their matvec output is masked anyway
        s = self.structure
        rows_owned = self.owned[s.rows]
        is_diag = s.rows == s.indices
        eye = jnp.eye(self.npv, dtype=mat.data.dtype)
        data = jnp.where(
            rows_owned[:, None, None],
            mat.data,
            jnp.where(is_diag[:, None, None], eye, jnp.zeros((), mat.data.dtype)),
        )
        return r, L, fluxes, err, bsr.BSRMatrix(structure=s, data=data)


class _LocalSources:
    """Per-device view of a replicated source network: cell indices
    remapped to local slots, rates masked to the owning device so each
    source is applied exactly once."""

    def __init__(self, base, cell_local, owner_mask):
        self.base = copy.copy(base)
        self.base.arrays = base.arrays._replace(cell=cell_local)
        self.arrays = self.base.arrays
        self.num_sources = base.num_sources
        self.owner_mask = owner_mask

    def flows(self, fluid, t0, t1):
        rate, enthalpy = self.base.flows(fluid, t0, t1)
        return jnp.where(self.owner_mask, rate, 0.0), enthalpy


class DistributedSystem:
    """Host-side builder: partitions a Simulation over a device mesh
    and provides local<->global transfer plus the shard_mapped step."""

    def __init__(self, sim, num_devices: int, devices=None):
        self.sim = sim
        self.plan: PartitionPlan = build_partition(sim.mesh, num_devices)
        self.num_devices = num_devices
        if devices is None:
            devices = jax.devices()[:num_devices]
        self.device_mesh = DeviceMesh(np.array(devices), (AXIS,))
        self.sharding = NamedSharding(self.device_mesh, P(AXIS))

        plan = self.plan
        D = num_devices
        mesh = sim.mesh
        npv = sim.eos.num_primary_variables

        # --- stacked local mesh arrays [D, ...] ----------------------
        fid = plan.face_ids
        fmask = plan.face_mask
        area = np.asarray(mesh.face_area)[fid] * fmask
        dist = np.asarray(mesh.face_distance)[fid]
        dist12 = np.where(fmask, np.asarray(mesh.face_distance12)[fid], 1.0)
        dist = np.where(fmask[..., None], dist, 0.5)
        gnorm = np.asarray(mesh.face_gravity_normal)[fid] * fmask
        pdir = np.asarray(mesh.face_permeability_direction)[fid] * fmask
        lc = plan.local_cells
        vol = np.asarray(mesh.cell_volume)[lc]
        ghost = np.asarray(mesh.is_ghost)[lc]

        self._mesh_static = dict(
            face_cells=jnp.asarray(plan.face_cells_local, jnp.int32),
            face_area=jnp.asarray(area),
            face_distance=jnp.asarray(dist),
            face_distance12=jnp.asarray(dist12),
            face_gravity_normal=jnp.asarray(gnorm),
            face_permeability_direction=jnp.asarray(pdir, jnp.int32),
            cell_volume=jnp.asarray(vol),
            is_ghost=jnp.asarray(ghost),
        )

        # --- per-device BSR structures, padded to common nnzb --------
        structs = []
        positions = []
        for d in range(D):
            fc = plan.face_cells_local[d]
            st = bsr.build_structure(plan.n_local, fc, npv)
            lr, rl = bsr.face_block_positions(st, fc)
            structs.append(st)
            positions.append((lr, rl))
        nnzb = max(int(s.indices.shape[0]) for s in structs)
        # common ELL width across devices (scatter-free SpMV)
        ell_width = max(
            int(np.diff(np.asarray(s.indptr)).max()) for s in structs
        )
        rows = np.zeros((D, nnzb), np.int32)
        # pad cols != pad rows so padded entries never look like
        # diagonal blocks in the ghost-row fixup (they stay zero)
        cols = np.full((D, nnzb), min(1, plan.n_local - 1), np.int32)
        diag_pos = np.zeros((D, plan.n_local), np.int32)
        pos_lr = np.zeros((D,) + plan.face_cells_local.shape[1:2], np.int32)
        pos_rl = np.zeros_like(pos_lr)
        ell_indices = np.zeros((D, plan.n_local, ell_width), np.int32)
        ell_pos = np.zeros_like(ell_indices)
        for d, st in enumerate(structs):
            k = int(st.indices.shape[0])
            rows[d, :k] = np.asarray(st.rows)
            cols[d, :k] = np.asarray(st.indices)
            # pad entries: duplicate diag key of row 0; never written
            diag_pos[d] = np.asarray(st.diag_pos)
            pos_lr[d], pos_rl[d] = positions[d]
            es = ops_ell.ell_structure(st, width=ell_width)
            ell_indices[d] = np.asarray(es.indices)
            # pad sentinel (this device's nnzb) lands in the
            # zero-padded tail of the common-size data array
            ell_pos[d] = np.asarray(es.gather_pos)
        self._bsr_static = dict(
            rows=jnp.asarray(rows),
            cols=jnp.asarray(cols),
            diag_pos=jnp.asarray(diag_pos),
            pos_lr=jnp.asarray(pos_lr),
            pos_rl=jnp.asarray(pos_rl),
            ell_indices=jnp.asarray(ell_indices),
            ell_pos=jnp.asarray(ell_pos),
        )
        self._nnzb = nnzb
        self._ell_width = ell_width

        # --- routing tables ------------------------------------------
        self._route_static = dict(
            owned=jnp.asarray(plan.owned_mask),
            send_idx=jnp.asarray(plan.send_idx, jnp.int32),
            recv_src=jnp.asarray(plan.recv_src, jnp.int32),
        )

        # --- rock + sources ------------------------------------------
        self._rock_local = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a)[lc]), sim.rock
        )
        network = getattr(sim, "sources", None)
        if network is not None and network.num_sources == 0:
            network = None
        if network is not None and getattr(network, "has_network", False):
            raise NotImplementedError(
                "distributed runs with source groups/reinjectors are "
                "not supported yet"
            )
        self._network = network
        if network is not None:
            src_cells = np.asarray(network.arrays.cell)
            owner = plan.cell_device[src_cells]  # [ns]
            slot = plan.cell_slot[src_cells]
            # on each device: local slot if owned here, else slot 0
            cell_local = np.where(
                owner[None, :] == np.arange(D)[:, None], slot[None, :], 0
            )
            self._src_static = dict(
                src_cell_local=jnp.asarray(cell_local, jnp.int32),
                src_owner_mask=jnp.asarray(
                    owner[None, :] == np.arange(D)[:, None]
                ),
            )
        else:
            self._src_static = None

        # shard all stacked arrays over the device mesh
        put = lambda t: jax.device_put(t, self.sharding)
        self._mesh_static = jax.tree_util.tree_map(put, self._mesh_static)
        self._bsr_static = jax.tree_util.tree_map(put, self._bsr_static)
        self._route_static = jax.tree_util.tree_map(put, self._route_static)
        self._rock_local = jax.tree_util.tree_map(put, self._rock_local)
        if self._src_static is not None:
            self._src_static = jax.tree_util.tree_map(put, self._src_static)

    # -- global <-> local transfers -----------------------------------

    def to_local(self, x):
        """Gather global [N, ...] arrays into stacked local [D, n_local,
        ...] arrays (DMGlobalToLocal with overlap-1 halo)."""

        def g(a):
            return jax.device_put(
                jnp.asarray(np.asarray(a)[self.plan.local_cells]),
                self.sharding,
            )

        return jax.tree_util.tree_map(g, x)

    def from_local(self, x):
        """Scatter owned rows of stacked local arrays back to global
        natural order (for I/O; LocalToGlobal)."""
        plan = self.plan

        def s(a):
            a = np.asarray(a)
            n = plan.cell_device.shape[0]
            out = np.zeros((n,) + a.shape[2:], a.dtype)
            out[:] = a[plan.cell_device, plan.cell_slot]
            return out

        return jax.tree_util.tree_map(s, x)

    # -- the shard_mapped step ----------------------------------------

    def _local_system(self, mesh_st, bsr_st, route_st, src_st):
        mesh_local = MeshArrays(
            face_cells=mesh_st["face_cells"],
            face_area=mesh_st["face_area"],
            face_distance=mesh_st["face_distance"],
            face_distance12=mesh_st["face_distance12"],
            face_gravity_normal=mesh_st["face_gravity_normal"],
            face_permeability_direction=mesh_st[
                "face_permeability_direction"
            ],
            cell_volume=mesh_st["cell_volume"],
            is_ghost=mesh_st["is_ghost"],
            num_cells=self.plan.n_local,
            num_interior_cells=self.plan.n_local,
        )
        npv = self.sim.eos.num_primary_variables
        structure = BSRStructure(
            indptr=None,
            indices=bsr_st["cols"],
            rows=bsr_st["rows"],
            diag_pos=bsr_st["diag_pos"],
            num_rows=self.plan.n_local,
            block_size=npv,
        )
        ell_struct = ops_ell.ELLStructure(
            indices=bsr_st["ell_indices"],
            gather_pos=bsr_st["ell_pos"],
            num_rows=self.plan.n_local,
            block_size=npv,
            width=self._ell_width,
        )
        network = None
        if self._network is not None:
            network = _LocalSources(
                self._network,
                src_st["src_cell_local"],
                src_st["src_owner_mask"],
            )
        return LocalSystem(
            self.sim.eos,
            mesh_local,
            network,
            structure,
            ell_struct,
            bsr_st["pos_lr"],
            bsr_st["pos_rl"],
            route_st["owned"],
            route_st["send_idx"],
            route_st["recv_src"],
            self.plan.n_owned_pad,
        )

    def make_step_fn(
        self, newton_params: NewtonParams, method: str = "beuler"
    ):
        """Distributed analogue of Simulation.make_step_fn: same traced
        signature, but all cell arrays are stacked local [D, n_local,
        ...] (use to_local/from_local to convert)."""
        if newton_params.linear_pc not in ("bjacobi", "jacobi", "none"):
            newton_params = newton_params._replace(linear_pc="bjacobi")
        steady = method == "directss"
        bdf2 = method == "bdf2"
        sim = self.sim

        loc = P(AXIS)
        rep = P()

        statics = (
            self._mesh_static,
            self._bsr_static,
            self._route_static,
            self._src_static,
            self._rock_local,
        )
        statics_specs = jax.tree_util.tree_map(lambda _: loc, statics)

        def local_step(
            mesh_st, bsr_st, route_st, src_st, rock, y, region,
            temperature, lhs_last, lhs_last2, t_last, dt, dt_last, first
        ):
            # shard_map blocks carry a leading device axis of size 1
            sq = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
            mesh_st, bsr_st, route_st, rock = (
                sq(mesh_st), sq(bsr_st), sq(route_st), sq(rock),
            )
            if src_st is not None:
                src_st = sq(src_st)
            y, region, temperature, lhs_last, lhs_last2 = (
                y[0], region[0], temperature[0], lhs_last[0], lhs_last2[0],
            )
            system = self._local_system(mesh_st, bsr_st, route_st, src_st)

            t0 = t_last
            t1 = t_last + dt
            if steady:
                coeffs = MethodCoeffs(
                    c_lhs=jnp.asarray(0.0),
                    dt_eff=jnp.asarray(-1.0),
                    const=jnp.zeros_like(lhs_last),
                )
            elif bdf2:
                r = dt / dt_last
                use_be = first > 0.5
                c_l = jnp.where(use_be, 1.0, 1.0 + 2.0 * r)
                dt_eff = jnp.where(use_be, dt, dt * (r + 1.0))
                const = jnp.where(
                    use_be,
                    -lhs_last,
                    -((r + 1.0) ** 2) * lhs_last + (r * r) * lhs_last2,
                )
                coeffs = MethodCoeffs(
                    c_lhs=c_l, dt_eff=dt_eff, const=const
                )
            else:
                coeffs = MethodCoeffs(
                    c_lhs=jnp.asarray(1.0), dt_eff=dt, const=-lhs_last
                )
            res = newton_solve(
                system,
                y,
                region,
                temperature,
                rock,
                coeffs,
                t0,
                t1,
                lhs_scale=lhs_last,
                params=newton_params,
            )
            fluid, cond, _ = system.derived_state(res.y, res.region, rock)
            lhs_new = system.lhs(fluid, rock)
            _, fluxes = system.rhs(fluid, cond, rock, t0, t1)
            ex = lambda t: jax.tree_util.tree_map(lambda a: a[None], t)
            return ex(res._replace(
                iterations=res.iterations,
                converged=res.converged,
                failed=res.failed,
                max_residual=res.max_residual,
                linear_iterations=res.linear_iterations,
            )), ex(fluid), ex(lhs_new), ex(fluxes)

        from waiwera_tpu.solver.newton import NewtonResult

        out_res_spec = NewtonResult(
            y=loc, region=loc, iterations=loc, converged=loc,
            failed=loc, max_residual=loc, linear_iterations=loc,
        )

        mapped = jax.shard_map(
            local_step,
            mesh=self.device_mesh,
            in_specs=statics_specs
            + (loc, loc, loc, loc, loc, rep, rep, rep, rep),
            out_specs=(out_res_spec, loc, loc, loc),
            check_vma=False,
        )

        @jax.jit
        def step(y, region, temperature, lhs_last, lhs_last2, t_last, dt,
                 dt_last, first):
            res, fluid, lhs_new, fluxes = mapped(
                *statics, y, region, temperature, lhs_last, lhs_last2,
                t_last, dt, dt_last, first,
            )
            # scalar diagnostics are replicated; take device 0's copy
            res = res._replace(
                iterations=res.iterations[0],
                converged=res.converged[0],
                failed=res.failed[0],
                max_residual=res.max_residual[0],
                linear_iterations=res.linear_iterations[0],
            )
            return res, fluid, lhs_new, fluxes

        return step
