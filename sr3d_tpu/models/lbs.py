"""Linear blend skinning math for FLAME, in pure JAX.

Functional re-implementation of the standard SMPL/FLAME LBS pipeline the
reference uses (reference: model/mica/lbs.py:142-379).  Every step is an
einsum/gather that XLA lowers directly onto the MXU; the kinematic-chain
accumulation is a ``lax.scan`` over joints (J=5 for FLAME) instead of a python
loop of batched matmuls.

Conventions: float32 throughout (shape regression accuracy target is
<1e-3 mean vertex error), batch-first shapes, ``[B,V,3]`` vertices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_rodrigues(rot_vecs: jax.Array, epsilon: float = 1e-8) -> jax.Array:
    """Axis-angle [N,3] → rotation matrices [N,3,3] (Rodrigues' formula).

    Matches reference model/mica/lbs.py:276-307 including the ``+1e-8``
    norm-stabilisation so zero poses are differentiable.
    """
    angle = jnp.linalg.norm(rot_vecs + epsilon, axis=1, keepdims=True)  # [N,1]
    rot_dir = rot_vecs / angle
    cos = jnp.cos(angle)[:, None, :]  # [N,1,1]
    sin = jnp.sin(angle)[:, None, :]

    rx, ry, rz = jnp.split(rot_dir, 3, axis=1)
    zeros = jnp.zeros_like(rx)
    K = jnp.concatenate(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(-1, 3, 3)
    ident = jnp.eye(3, dtype=rot_vecs.dtype)[None]
    return ident + sin * K + (1.0 - cos) * jnp.matmul(K, K)


def rot_mat_to_euler(rot_mats: jax.Array) -> jax.Array:
    """Y-axis euler angle from rotation matrices [N,3,3]
    (reference model/mica/lbs.py:27-33)."""
    sy = jnp.sqrt(rot_mats[:, 0, 0] * rot_mats[:, 0, 0]
                  + rot_mats[:, 1, 0] * rot_mats[:, 1, 0])
    return jnp.arctan2(-rot_mats[:, 2, 0], sy)


def blend_shapes(betas: jax.Array, shape_disps: jax.Array) -> jax.Array:
    """[B,L] coefficients × [V,3,L] basis → [B,V,3] displacements
    (reference :252-273)."""
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps)


def vertices2joints(J_regressor: jax.Array, vertices: jax.Array) -> jax.Array:
    """[J,V] regressor × [B,V,3] → [B,J,3] (reference :232-249)."""
    return jnp.einsum("bik,ji->bjk", vertices, J_regressor)


def vertices2landmarks(vertices: jax.Array, faces: jax.Array,
                       lmk_faces_idx: jax.Array,
                       lmk_bary_coords: jax.Array) -> jax.Array:
    """Barycentric landmark interpolation (reference :103-139).

    vertices [B,V,3]; faces [F,3] int; lmk_faces_idx [B,L] or [L] int;
    lmk_bary_coords [B,L,3] or [L,3].  Returns [B,L,3].
    """
    if lmk_faces_idx.ndim == 1:
        lmk_faces_idx = jnp.broadcast_to(
            lmk_faces_idx[None], (vertices.shape[0],) + lmk_faces_idx.shape)
    if lmk_bary_coords.ndim == 2:
        lmk_bary_coords = jnp.broadcast_to(
            lmk_bary_coords[None],
            (vertices.shape[0],) + lmk_bary_coords.shape)
    lmk_faces = faces[lmk_faces_idx]              # [B,L,3] vertex ids
    lmk_vertices = jnp.take_along_axis(
        vertices[:, :, None, :],                   # [B,V,1,3]
        lmk_faces[:, :, :, None],                  # [B,L,3,1]
        axis=1)                                    # [B,L,3,3]
    return jnp.einsum("blfi,blf->bli", lmk_vertices, lmk_bary_coords)


def transform_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    """[...,3,3] + [...,3,1] → [...,4,4] homogeneous transforms
    (reference :310-320)."""
    top = jnp.concatenate([R, t], axis=-1)                      # [...,3,4]
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def batch_rigid_transform(
    rot_mats: jax.Array, joints: jax.Array, parents: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Forward-kinematics over the joint tree (reference :323-379).

    rot_mats [B,J,3,3]; joints [B,J,3]; parents [J] (parents[0] == -1, and the
    FLAME kintree is topologically ordered, parents[i] < i).  Returns posed
    joints [B,J,3] and relative transforms [B,J,4,4].

    The chain accumulation is a ``lax.scan`` over joints; J is tiny (5 for
    FLAME) so this is negligible next to the skinning matmuls, but it keeps
    the whole decode inside one jit without a python loop.
    """
    B, J = joints.shape[:2]
    rel_joints = joints - jnp.where(
        (parents >= 0)[None, :, None], joints[:, jnp.clip(parents, 0)], 0.0)
    transforms_mat = transform_mat(rot_mats, rel_joints[..., None])  # [B,J,4,4]

    def body(chain, j):
        parent = jnp.clip(parents[j], 0)
        parent_tf = chain[:, parent]
        own = jnp.where(j == 0, transforms_mat[:, 0],
                        jnp.matmul(parent_tf, transforms_mat[:, j]))
        chain = jax.lax.dynamic_update_index_in_dim(chain, own, j, axis=1)
        return chain, None

    chain0 = jnp.zeros((B, J, 4, 4), dtype=joints.dtype)
    transforms, _ = jax.lax.scan(body, chain0, jnp.arange(J))

    posed_joints = transforms[:, :, :3, 3]
    # rel_transforms = T - pad(T @ [j;0])  (removes rest-pose joint offset)
    joints_homogen = jnp.concatenate(
        [joints[..., None], jnp.zeros((B, J, 1, 1), joints.dtype)], axis=2)
    correction = jnp.matmul(transforms, joints_homogen)  # [B,J,4,1]
    rel_transforms = transforms - jnp.pad(
        correction, ((0, 0), (0, 0), (0, 0), (3, 0)))
    return posed_joints, rel_transforms


def lbs(
    betas: jax.Array,
    pose: jax.Array,
    v_template: jax.Array,
    shapedirs: jax.Array,
    posedirs: jax.Array,
    J_regressor: jax.Array,
    parents: jax.Array,
    lbs_weights: jax.Array,
    pose2rot: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Full LBS (reference :142-229): blendshapes → joints → pose offsets →
    kinematics → skinning.  Returns (vertices [B,V,3], joints [B,J,3])."""
    B = max(betas.shape[0], pose.shape[0])

    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    J = vertices2joints(J_regressor, v_shaped)

    ident = jnp.eye(3, dtype=v_shaped.dtype)
    if pose2rot:
        rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(B, -1, 3, 3)
        pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
        pose_offsets = jnp.matmul(pose_feature, posedirs).reshape(B, -1, 3)
    else:
        pose_feature = pose[:, 1:].reshape(B, -1, 3, 3) - ident
        rot_mats = pose.reshape(B, -1, 3, 3)
        pose_offsets = jnp.matmul(
            pose_feature.reshape(B, -1), posedirs).reshape(B, -1, 3)

    v_posed = pose_offsets + v_shaped
    J_transformed, A = batch_rigid_transform(rot_mats, J, parents)

    # skinning: T = W @ A  ([B,V,J] × [B,J,16])
    num_joints = J_regressor.shape[0]
    W = jnp.broadcast_to(lbs_weights[None], (B,) + lbs_weights.shape)
    T = jnp.matmul(W, A.reshape(B, num_joints, 16)).reshape(B, -1, 4, 4)

    ones = jnp.ones((B, v_posed.shape[1], 1), dtype=v_posed.dtype)
    v_posed_homo = jnp.concatenate([v_posed, ones], axis=2)
    v_homo = jnp.matmul(T, v_posed_homo[..., None])
    verts = v_homo[:, :, :3, 0]
    return verts, J_transformed
