"""Frozen robot model pytree built from MJCF.

Replaces the reference's mjModel + dual Pinocchio model (robot_utils.cpp:19-55,
derivatives.cpp:26-59). All per-body quantities are stacked arrays so the
whole model is a pytree: jit-able, vmap-able (fleet domain randomization just
maps over `body_mass`, `gravity`, contact parameters, ...), and shard-able.

Structure metadata (tree topology, dof layout, joint types) is static python
so FK unrolls at trace time into pure array ops.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from mpc_ilqr_tpu.models import mjcf as mjcf_mod
from mpc_ilqr_tpu.models import stl

# Default H1 asset locations (copied from the reference's robots/ tree —
# model *data*, consumed as-is like the reference does via config.yaml).
_REPO_ROOT = os.path.normpath(os.path.join(os.path.dirname(__file__), "..", ".."))
H1_SCENE_XML = os.path.join(_REPO_ROOT, "robots", "h1_description", "mjcf", "scene.xml")

JNT_FREE = "free"
JNT_BALL = "ball"
JNT_HINGE = "hinge"
JNT_SLIDE = "slide"
JNT_FIXED = "fixed"

# (nq, nv) consumed per joint type
JNT_SIZES = {JNT_FREE: (7, 6), JNT_BALL: (4, 3), JNT_HINGE: (1, 1), JNT_SLIDE: (1, 1)}


class RobotModel(struct.PyTreeNode):
    # --- static structure (not traced) ---
    name: str = struct.field(pytree_node=False)
    nq: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    nu: int = struct.field(pytree_node=False)
    nbody: int = struct.field(pytree_node=False)
    body_names: Tuple[str, ...] = struct.field(pytree_node=False)
    body_parent: Tuple[int, ...] = struct.field(pytree_node=False)
    body_jnt_type: Tuple[str, ...] = struct.field(pytree_node=False)
    body_qpos_adr: Tuple[int, ...] = struct.field(pytree_node=False)
    body_dof_adr: Tuple[int, ...] = struct.field(pytree_node=False)
    joint_names: Tuple[str, ...] = struct.field(pytree_node=False)  # per body ("" if fixed)
    act_dof_adr: Tuple[int, ...] = struct.field(pytree_node=False)  # dof index per actuator
    ee_body_idx: Tuple[int, ...] = struct.field(pytree_node=False)  # end-effector bodies
    cp_body_idx: Tuple[int, ...] = struct.field(pytree_node=False)  # contact-point bodies
    limit_qpos_idx: Tuple[int, ...] = struct.field(pytree_node=False)  # limited hinge qpos
    timestep: float = struct.field(pytree_node=False)

    # --- traced arrays (domain-randomizable) ---
    body_pos: jnp.ndarray  # (B, 3) frame offset in parent frame
    body_quat: jnp.ndarray  # (B, 4) wxyz
    body_ipos: jnp.ndarray  # (B, 3) inertial frame origin in body frame
    body_iquat: jnp.ndarray  # (B, 4)
    body_mass: jnp.ndarray  # (B,)
    body_inertia: jnp.ndarray  # (B, 3) diagonal inertia in inertial frame
    jnt_axis: jnp.ndarray  # (B, 3) hinge axis in body frame (unused rows = z)
    jnt_pos: jnp.ndarray  # (B, 3) hinge anchor in body frame
    dof_damping: jnp.ndarray  # (nv,)
    dof_armature: jnp.ndarray  # (nv,)
    ancestor_mask: jnp.ndarray  # (B, nv) 1.0 where dof k moves body b
    act_gear: jnp.ndarray  # (nu,)
    ctrl_range: jnp.ndarray  # (nu, 2)
    limit_range: jnp.ndarray  # (n_limited, 2) hinge joint limits
    gravity: jnp.ndarray  # (3,)
    cp_pos: jnp.ndarray  # (ncp, 3) contact points in body frame
    # (ncp,) per-point surface radius: contact depth = radius - z_world.
    # Mesh sole points carry 0 (the sampled vertices ARE the surface);
    # sphere/capsule-derived points carry the primitive's radius.
    cp_radius: jnp.ndarray
    contact_stiffness: jnp.ndarray  # () N/m normal spring
    contact_damping: jnp.ndarray  # () N·s/m normal damper
    contact_friction: jnp.ndarray  # () Coulomb mu (smoothed)
    # () frictional-to-normal impedance ratio (MuJoCo opt.impratio; the
    # reference sets 100, robot_utils.cpp:58-63). Sharpens the stiction
    # regularization: tangential viscosity scales ~with sqrt(impratio)
    # (eps = 1e-6/impratio under the sqrt in engine.contact_terms; pinned by
    # test_impratio_stiffens_friction).
    contact_impratio: jnp.ndarray
    key_qpos: jnp.ndarray  # (nq,) "home" keyframe (zeros if absent)

    # Convenience ------------------------------------------------------------
    @property
    def nx(self) -> int:
        return self.nq + self.nv

    @property
    def ncp(self) -> int:
        return len(self.cp_body_idx)

    @property
    def has_free_base(self) -> bool:
        return JNT_FREE in self.body_jnt_type

    @property
    def n_ee(self) -> int:
        return len(self.ee_body_idx)

    def body_index(self, name: str) -> int:
        return self.body_names.index(name)

    def joint_dof_adr(self, joint_name: str) -> int:
        b = self.joint_names.index(joint_name)
        return self.body_dof_adr[b]

    def split_state(self, x: jnp.ndarray):
        return x[..., : self.nq], x[..., self.nq :]


def load_robot(
    xml_path: str,
    ee_body_names: Tuple[str, ...] = (),
    contact_stiffness: float = 3.0e4,
    contact_damping: float = 3.0e3,
    contact_friction: float = 1.0,
    contact_impratio: float = 1.0,
    gravity: Optional[Tuple[float, float, float]] = None,
    timestep: Optional[float] = None,
    dtype=jnp.float32,
) -> RobotModel:
    """Parse an MJCF file into a RobotModel.

    Full generality of mj_loadXML's joint model within the point-contact
    scope (robot_utils.cpp:22 parity): free/ball/hinge/slide joints, multiple
    joints per body (split into a chain of massless intermediate bodies so
    the level-batched kinematics stay single-joint-per-body), degree-angle
    MJCF, and contact points from collision meshes OR primitive geoms
    (sphere/capsule/box) on the end-effector bodies.
    """
    spec = mjcf_mod.parse_mjcf(xml_path)

    # --- split multi-joint bodies into single-joint chains -----------------
    # A body with joints [j1..jk] becomes k bodies: k-1 massless intermediates
    # (identity offsets — MJCF joint `pos`/`axis` are in the FINAL body frame,
    # which coincides with every intermediate frame) and the real body last.
    # MuJoCo applies a body's joints sequentially in document order
    # (mj_kinematics); the chain reproduces that composition exactly.
    bodies = []
    new_index = {}  # spec index -> chain-tail index in `bodies`
    for old_i, b in enumerate(spec.bodies):
        parent_new = new_index[b.parent] if b.parent >= 0 else -1
        if len(b.joints) <= 1:
            nb = mjcf_mod.BodySpec(
                name=b.name, parent=parent_new, pos=b.pos, quat=b.quat,
                ipos=b.ipos, iquat=b.iquat, mass=b.mass, inertia=b.inertia,
                joints=list(b.joints), geoms=list(b.geoms),
            )
            bodies.append(nb)
            new_index[old_i] = len(bodies) - 1
            continue
        for m, j in enumerate(b.joints):
            last = m == len(b.joints) - 1
            nb = mjcf_mod.BodySpec(
                name=b.name if last else f"{b.name}__chain{m}",
                parent=parent_new,
                pos=b.pos if m == 0 else np.zeros(3),
                quat=b.quat if m == 0 else np.array([1.0, 0, 0, 0]),
                ipos=b.ipos if last else np.zeros(3),
                iquat=b.iquat if last else np.array([1.0, 0, 0, 0]),
                mass=b.mass if last else 0.0,
                inertia=b.inertia if last else np.zeros(3),
                joints=[j],
                geoms=list(b.geoms) if last else [],
            )
            bodies.append(nb)
            parent_new = len(bodies) - 1
        new_index[old_i] = parent_new
    B = len(bodies)

    body_parent = []
    body_jnt_type = []
    body_qpos_adr = []
    body_dof_adr = []
    joint_names = []
    jnt_axis = np.tile(np.array([0.0, 0, 1.0]), (B, 1))
    jnt_pos = np.zeros((B, 3))
    limit_qpos_idx = []
    limit_range = []

    nq = 0
    nv = 0
    dof_damping = []
    dof_armature = []
    for i, b in enumerate(bodies):
        body_parent.append(b.parent)
        if not b.joints:
            body_jnt_type.append(JNT_FIXED)
            body_qpos_adr.append(-1)
            body_dof_adr.append(-1)
            joint_names.append("")
            continue
        j = b.joints[0]
        if j.jtype not in JNT_SIZES:
            raise NotImplementedError(f"joint type {j.jtype}")
        joint_names.append(j.name)
        body_qpos_adr.append(nq)
        body_dof_adr.append(nv)
        body_jnt_type.append(j.jtype)
        dnq, dnv = JNT_SIZES[j.jtype]
        if j.jtype in (JNT_HINGE, JNT_SLIDE):
            jnt_axis[i] = j.axis / np.linalg.norm(j.axis)
            jnt_pos[i] = j.pos
            if np.all(np.isfinite(j.range)) and j.range[0] < j.range[1]:
                limit_qpos_idx.append(nq)
                limit_range.append(j.range)
        elif j.jtype == JNT_BALL:
            jnt_pos[i] = j.pos
        nq += dnq
        nv += dnv
        dof_damping += [j.damping] * dnv
        dof_armature += [j.armature] * dnv

    # Ancestor mask: dof k moves body b iff k's joint is on b or an ancestor.
    ancestor = np.zeros((B, nv))
    for i in range(B):
        chain = []
        c = i
        while c >= 0:
            chain.append(c)
            c = body_parent[c]
        for c in chain:
            if body_jnt_type[c] != JNT_FIXED:
                dnv = JNT_SIZES[body_jnt_type[c]][1]
                ancestor[i, body_dof_adr[c] : body_dof_adr[c] + dnv] = 1.0

    # Actuators (motors on hinge joints; torque tau = gear * u).
    act_dof_adr = []
    act_gear = []
    ctrl_range = []
    jn_to_body = {jn: i for i, jn in enumerate(joint_names) if jn}
    for a in spec.actuators:
        bidx = jn_to_body[a.joint]
        if body_jnt_type[bidx] not in (JNT_HINGE, JNT_SLIDE):
            raise NotImplementedError(
                f"actuator on {body_jnt_type[bidx]} joint {a.joint!r}; "
                "motors are supported on hinge/slide joints"
            )
        act_dof_adr.append(body_dof_adr[bidx])
        act_gear.append(a.gear)
        ctrl_range.append(a.ctrlrange)
    nu = len(act_dof_adr)

    # End-effectors and contact points.
    name_to_idx = {b.name: i for i, b in enumerate(bodies)}
    ee_body_idx = tuple(name_to_idx[n] for n in ee_body_names)
    cp_body_idx = []
    cp_pos = []
    cp_radius = []

    def add_point(bidx, p, r=0.0):
        cp_body_idx.append(bidx)
        cp_pos.append(np.asarray(p, dtype=np.float64))
        cp_radius.append(float(r))

    from mpc_ilqr_tpu.models._np_quat import np_quat_to_mat

    for bidx in ee_body_idx:
        b = bodies[bidx]
        for g in b.geoms:
            if not (g.contype or g.conaffinity):
                continue
            if g.mesh and g.mesh in spec.meshes:
                # Collision mesh: sampled sole vertices ARE the surface.
                verts = stl.read_stl_vertices(spec.meshes[g.mesh])
                verts = (np_quat_to_mat(g.quat) @ verts.T).T + g.pos
                for p in stl.sole_contact_points(verts):
                    add_point(bidx, p)
                break
            # Primitive geoms: centers/corners with the surface radius folded
            # into cp_radius (contact depth = radius − z_world). Mirrors how
            # mj_loadXML-built robots with primitive feet still collide
            # (robot_utils.cpp:22 accepts any model; our mesh-only round-2
            # derivation silently gave such robots no contact at all).
            Rg = np_quat_to_mat(g.quat)
            if g.gtype == "sphere":
                add_point(bidx, g.pos, g.size[0])
                break
            if g.gtype == "capsule":
                half = g.size[1] if g.size.size > 1 else 0.0
                for s in (-half, half):
                    add_point(bidx, g.pos + Rg @ np.array([0.0, 0, s]), g.size[0])
                break
            if g.gtype == "box":
                sx, sy, sz = g.size[:3]
                for cx in (-sx, sx):
                    for cy in (-sy, sy):
                        for cz in (-sz, sz):
                            add_point(bidx, g.pos + Rg @ np.array([cx, cy, cz]))
                break
    cp_pos = np.array(cp_pos).reshape(-1, 3)
    cp_radius = np.array(cp_radius).reshape(-1)

    key_qpos = np.zeros(nq)
    if "home" in spec.keyframes:
        key_qpos = spec.keyframes["home"]
    elif spec.keyframes:
        key_qpos = next(iter(spec.keyframes.values()))

    g = np.array(gravity) if gravity is not None else spec.gravity
    arr = lambda a: jnp.asarray(np.asarray(a, dtype=np.float64), dtype=dtype)

    return RobotModel(
        name=spec.model_name,
        nq=nq,
        nv=nv,
        nu=nu,
        nbody=B,
        body_names=tuple(b.name for b in bodies),
        body_parent=tuple(body_parent),
        body_jnt_type=tuple(body_jnt_type),
        body_qpos_adr=tuple(body_qpos_adr),
        body_dof_adr=tuple(body_dof_adr),
        joint_names=tuple(joint_names),
        act_dof_adr=tuple(act_dof_adr),
        ee_body_idx=ee_body_idx,
        cp_body_idx=tuple(cp_body_idx),
        limit_qpos_idx=tuple(limit_qpos_idx),
        timestep=float(timestep if timestep is not None else spec.timestep),
        body_pos=arr(np.stack([b.pos for b in bodies])),
        body_quat=arr(np.stack([b.quat for b in bodies])),
        body_ipos=arr(np.stack([b.ipos for b in bodies])),
        body_iquat=arr(np.stack([b.iquat for b in bodies])),
        body_mass=arr([b.mass for b in bodies]),
        body_inertia=arr(np.stack([b.inertia for b in bodies])),
        jnt_axis=arr(jnt_axis),
        jnt_pos=arr(jnt_pos),
        dof_damping=arr(dof_damping),
        dof_armature=arr(dof_armature),
        ancestor_mask=arr(ancestor),
        act_gear=arr(act_gear),
        ctrl_range=arr(np.stack(ctrl_range) if ctrl_range else np.zeros((0, 2))),
        limit_range=arr(np.stack(limit_range) if limit_range else np.zeros((0, 2))),
        gravity=arr(g),
        cp_pos=arr(cp_pos),
        cp_radius=arr(cp_radius),
        contact_stiffness=arr(contact_stiffness),
        contact_damping=arr(contact_damping),
        contact_friction=arr(contact_friction),
        contact_impratio=arr(contact_impratio),
        key_qpos=arr(key_qpos),
    )


def load_h1(
    xml_path: str = H1_SCENE_XML,
    gravity=None,
    timestep: Optional[float] = None,
    dtype=jnp.float32,
    **kw,
) -> RobotModel:
    """Load the Unitree H1 (nq=26, nv=25, nu=19) with foot end-effectors.

    Mirrors the reference setup: left/right ankle links are the feet
    (robot_utils.cpp:44-47), dt and gravity come from config.
    """
    return load_robot(
        xml_path,
        ee_body_names=("left_ankle_link", "right_ankle_link"),
        gravity=gravity,
        timestep=timestep,
        dtype=dtype,
        **kw,
    )


def scale_robot_mass(model: RobotModel, factor: float) -> RobotModel:
    """Fault-injection knob: uniformly scale all body masses and inertias
    (RobotUtils::scaleRobotMass, robot_utils.cpp:835-842 — the reference
    scales masses only; inertias scale with them here for physical
    consistency)."""
    return model.replace(
        body_mass=model.body_mass * factor,
        body_inertia=model.body_inertia * factor,
    )


def set_gravity(model: RobotModel, gx: float, gy: float, gz: float) -> RobotModel:
    """RobotUtils::setGravity (robot_utils.cpp:782-789) as a pure update."""
    return model.replace(gravity=jnp.asarray([gx, gy, gz], model.gravity.dtype))


def standing_state(model: RobotModel, height: float = 1.0432) -> jnp.ndarray:
    """The reference's standing initial state: zeros except z and qw
    (robot_utils.cpp:557-596)."""
    q = jnp.zeros(model.nq, dtype=model.body_pos.dtype)
    q = q.at[2].set(height)
    q = q.at[3].set(1.0)
    return jnp.concatenate([q, jnp.zeros(model.nv, dtype=q.dtype)])
