"""FLAME 2020 head model decoder in pure JAX.

Re-design of the reference FLAME module (reference: model/mica/flame.py:45-298)
as an immutable buffer pytree + pure functions: the decode is a handful of
einsums (blendshapes, joint regression, skinning) that map directly onto the
MXU, and the whole thing lives inside the jitted joint train step.

Assets: loads the real FLAME2020 ``generic_model.pkl`` +
``landmark_embedding.npy`` when present (same file formats as the reference);
``synthetic_flame`` builds a structurally identical miniature model so every
code path is testable without the proprietary assets.
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import lbs as lbs_ops


def _to_np(array: Any, dtype=np.float32) -> np.ndarray:
    """Convert FLAME pickle entries (numpy / chumpy / scipy-sparse)."""
    if hasattr(array, "todense"):  # scipy sparse
        array = array.todense()
    if hasattr(array, "r"):  # chumpy
        array = array.r
    return np.array(array, dtype=dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlameModel:
    """FLAME buffers (float32/int32 arrays). Shapes for the real model:
    V=5023, J=5, F=9976, n_shape≤300, n_exp=100, P=36."""

    faces: jax.Array                    # [F,3] int32
    v_template: jax.Array               # [V,3]
    shapedirs: jax.Array                # [V,3,n_shape+n_exp]
    posedirs: jax.Array                 # [P, V*3]
    J_regressor: jax.Array              # [J,V]
    parents: jax.Array                  # [J] int32, parents[0] = -1
    lbs_weights: jax.Array              # [V,J]
    lmk_faces_idx: jax.Array            # [51] int32 (static)
    lmk_bary_coords: jax.Array          # [51,3]
    dynamic_lmk_faces_idx: jax.Array    # [79,17] int32
    dynamic_lmk_bary_coords: jax.Array  # [79,17,3]
    full_lmk_faces_idx: jax.Array       # [68] int32
    full_lmk_bary_coords: jax.Array     # [68,3]
    neck_kin_chain: jax.Array           # [K] int32
    n_shape: int = dataclasses.field(metadata=dict(static=True), default=300)
    n_exp: int = dataclasses.field(metadata=dict(static=True), default=100)

    @property
    def n_vertices(self) -> int:
        return int(self.v_template.shape[0])


def _neck_kin_chain(parents: np.ndarray, neck_idx: int = 1) -> np.ndarray:
    chain = []
    curr = neck_idx
    while curr != -1:
        chain.append(curr)
        curr = int(parents[curr])
    return np.asarray(chain, dtype=np.int32)


def load_flame(
    flame_model_path: str,
    lmk_embedding_path: str,
    n_shape: int = 300,
) -> FlameModel:
    """Load real FLAME2020 assets (same formats as reference
    model/mica/flame.py:52-109)."""
    with open(flame_model_path, "rb") as f:
        ss = pickle.load(f, encoding="latin1")

    shapedirs = _to_np(ss["shapedirs"])
    # keep first n_shape shape dirs + the 100 expression dirs at [300:400]
    shapedirs = np.concatenate(
        [shapedirs[:, :, :n_shape], shapedirs[:, :, 300:]], axis=2)
    num_pose_basis = ss["posedirs"].shape[-1]
    posedirs = np.reshape(_to_np(ss["posedirs"]), [-1, num_pose_basis]).T
    parents = _to_np(ss["kintree_table"], dtype=np.int64)[0].astype(np.int32)
    parents[0] = -1

    lmk = np.load(lmk_embedding_path, allow_pickle=True, encoding="latin1")
    lmk = lmk[()]

    def as_np(x, dtype=np.float32):
        if hasattr(x, "detach"):  # torch tensor stored in the npy
            x = x.detach().cpu().numpy()
        return np.asarray(x, dtype=dtype)

    i32 = lambda x: jnp.asarray(as_np(x, np.int64), dtype=jnp.int32)
    f32 = lambda x: jnp.asarray(as_np(x, np.float32))

    return FlameModel(
        faces=jnp.asarray(_to_np(ss["f"], dtype=np.int64), dtype=jnp.int32),
        v_template=f32(_to_np(ss["v_template"])),
        shapedirs=f32(shapedirs),
        posedirs=f32(posedirs),
        J_regressor=f32(_to_np(ss["J_regressor"])),
        parents=jnp.asarray(parents),
        lbs_weights=f32(_to_np(ss["weights"])),
        lmk_faces_idx=i32(lmk["static_lmk_faces_idx"]),
        lmk_bary_coords=f32(lmk["static_lmk_bary_coords"]),
        dynamic_lmk_faces_idx=i32(lmk["dynamic_lmk_faces_idx"]),
        dynamic_lmk_bary_coords=f32(lmk["dynamic_lmk_bary_coords"]),
        full_lmk_faces_idx=i32(np.asarray(lmk["full_lmk_faces_idx"]).reshape(-1)),
        full_lmk_bary_coords=f32(
            np.asarray(lmk["full_lmk_bary_coords"]).reshape(-1, 3)),
        neck_kin_chain=jnp.asarray(_neck_kin_chain(parents)),
        n_shape=n_shape,
        n_exp=int(shapedirs.shape[2]) - n_shape,
    )


def synthetic_flame(
    n_vertices: int = 128,
    n_shape: int = 16,
    n_exp: int = 8,
    seed: int = 0,
) -> FlameModel:
    """Miniature random FLAME with the same structure (5 joints, 4 pose-joint
    basis, static 51 + dynamic 79×17 + full 68 landmark tables) for tests and
    benchmarks that must run without the licensed assets."""
    rng = np.random.RandomState(seed)
    J = 5
    F = max(2 * n_vertices, 64)
    faces = rng.randint(0, n_vertices, size=(F, 3)).astype(np.int32)
    parents = np.array([-1, 0, 1, 1, 1], dtype=np.int32)

    lbs_w = rng.rand(n_vertices, J).astype(np.float32)
    lbs_w /= lbs_w.sum(1, keepdims=True)
    jreg = rng.rand(J, n_vertices).astype(np.float32)
    jreg /= jreg.sum(1, keepdims=True)

    def bary(*shape):
        b = rng.rand(*shape, 3).astype(np.float32)
        return b / b.sum(-1, keepdims=True)

    return FlameModel(
        faces=jnp.asarray(faces),
        v_template=jnp.asarray(rng.randn(n_vertices, 3).astype(np.float32) * 0.1),
        shapedirs=jnp.asarray(
            rng.randn(n_vertices, 3, n_shape + n_exp).astype(np.float32) * 1e-2),
        posedirs=jnp.asarray(
            rng.randn((J - 1) * 9, n_vertices * 3).astype(np.float32) * 1e-3),
        J_regressor=jnp.asarray(jreg),
        parents=jnp.asarray(parents),
        lbs_weights=jnp.asarray(lbs_w),
        lmk_faces_idx=jnp.asarray(
            rng.randint(0, F, size=(51,)).astype(np.int32)),
        lmk_bary_coords=jnp.asarray(bary(51)),
        dynamic_lmk_faces_idx=jnp.asarray(
            rng.randint(0, F, size=(79, 17)).astype(np.int32)),
        dynamic_lmk_bary_coords=jnp.asarray(bary(79, 17)),
        full_lmk_faces_idx=jnp.asarray(
            rng.randint(0, F, size=(68,)).astype(np.int32)),
        full_lmk_bary_coords=jnp.asarray(bary(68)),
        neck_kin_chain=jnp.asarray(_neck_kin_chain(parents)),
        n_shape=n_shape,
        n_exp=n_exp,
    )


def sphere_flame(
    n_rings: int = 16,
    n_segments: int = 24,
    n_shape: int = 16,
    n_exp: int = 8,
    seed: int = 0,
    radius: float = 0.15,
    amp: float = 0.012,
) -> FlameModel:
    """Renderable synthetic FLAME: a smooth UV-sphere head whose shape space
    is a bank of low-frequency radial deformation fields with decaying
    amplitudes.

    ``synthetic_flame`` (above) draws random triangles over random points —
    structurally complete but visually meaningless, so images rendered from
    it carry almost no usable identity signal.  This variant exists for the
    identity-correlated synthetic datasets
    (data/synthetic.py::generate_correlated_joint_root): rendering
    ``flame_forward(β)`` produces images whose silhouette/shading visibly
    depend on β, making the identity→shape task of the joint model
    (reference model/sr3d/model.py:441-533) actually *learnable* without the
    licensed FLAME2020 assets.

    Design notes:
    * shape dir k displaces along the outward radial direction with a
      smooth spatial profile ``cos(w_k·p/r + φ_k)`` (|w_k| ∈ [1,4]: one to
      four waves across the head) and amplitude ``amp/(1+0.15k)`` — the
      leading components dominate both the rendered appearance AND the
      vertex-L1 loss, so what the loss rewards is what the image shows;
    * LBS weights put all mass on the root joint → zero pose is exactly
      rigid (the MICA decode is shape-only, train/joint.py::decode_mica);
    * landmark tables are valid (real faces + barycentrics) for the
      export/vis paths.
    """
    rng = np.random.RandomState(seed)
    J = 5

    # UV sphere: n_rings latitude bands (poles excluded) × n_segments
    ring_t = (np.arange(1, n_rings) / n_rings) * np.pi        # polar angle
    seg_p = (np.arange(n_segments) / n_segments) * 2 * np.pi  # azimuth
    tt, pp = np.meshgrid(ring_t, seg_p, indexing="ij")        # [R-1,S]
    xyz = np.stack([np.sin(tt) * np.cos(pp),
                    np.cos(tt),                               # y = up axis
                    np.sin(tt) * np.sin(pp)], axis=-1).reshape(-1, 3)
    top = np.array([[0.0, 1.0, 0.0]])
    bot = np.array([[0.0, -1.0, 0.0]])
    unit = np.concatenate([top, xyz, bot], 0).astype(np.float32)  # [V,3]
    V = unit.shape[0]

    def vid(r, s):  # ring r ∈ [0, n_rings-2], segment s (wraps)
        return 1 + r * n_segments + (s % n_segments)

    faces = []
    for s in range(n_segments):              # top cap (CCW from outside)
        faces.append((0, vid(0, s), vid(0, s + 1)))
    for r in range(n_rings - 2):             # quad bands
        for s in range(n_segments):
            a, b = vid(r, s), vid(r, s + 1)
            c, d = vid(r + 1, s), vid(r + 1, s + 1)
            faces.append((a, c, b))
            faces.append((b, c, d))
    for s in range(n_segments):              # bottom cap
        faces.append((V - 1, vid(n_rings - 2, s + 1), vid(n_rings - 2, s)))
    faces = np.asarray(faces, np.int32)
    F = faces.shape[0]

    # smooth radial shape dirs, leading components largest
    K = n_shape + n_exp
    w = rng.uniform(1.0, 4.0, (K, 3)) * rng.choice([-1, 1], (K, 3))
    phi = rng.uniform(0, 2 * np.pi, K)
    prof = np.cos(unit @ w.T + phi)                        # [V,K]
    amps = amp / (1.0 + 0.15 * np.arange(K))
    shapedirs = (unit[:, :, None] * (prof * amps)[:, None, :]
                 ).astype(np.float32)                      # [V,3,K]

    parents = np.array([-1, 0, 1, 1, 1], dtype=np.int32)
    lbs_w = np.zeros((V, J), np.float32)
    lbs_w[:, 0] = 1.0                                      # rigid at zero pose
    jreg = np.full((J, V), 1.0 / V, np.float32)

    def bary(*shape):
        b = rng.rand(*shape, 3).astype(np.float32)
        return b / b.sum(-1, keepdims=True)

    return FlameModel(
        faces=jnp.asarray(faces),
        v_template=jnp.asarray(unit * radius),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(np.zeros(((J - 1) * 9, V * 3), np.float32)),
        J_regressor=jnp.asarray(jreg),
        parents=jnp.asarray(parents),
        lbs_weights=jnp.asarray(lbs_w),
        lmk_faces_idx=jnp.asarray(
            rng.randint(0, F, size=(51,)).astype(np.int32)),
        lmk_bary_coords=jnp.asarray(bary(51)),
        dynamic_lmk_faces_idx=jnp.asarray(
            rng.randint(0, F, size=(79, 17)).astype(np.int32)),
        dynamic_lmk_bary_coords=jnp.asarray(bary(79, 17)),
        full_lmk_faces_idx=jnp.asarray(
            rng.randint(0, F, size=(68,)).astype(np.int32)),
        full_lmk_bary_coords=jnp.asarray(bary(68)),
        neck_kin_chain=jnp.asarray(_neck_kin_chain(parents)),
        n_shape=n_shape,
        n_exp=n_exp,
    )


def write_reference_format_assets(
    out_dir: str,
    n_vertices: int = 64,
    seed: int = 0,
) -> dict[str, str]:
    """Write a miniature FLAME asset set in the REAL on-disk formats —
    ``generic_model.pkl`` (dict with 400-column shapedirs, kintree_table,
    posedirs [V,3,36], …), ``landmark_embedding.npy`` (pickled dict) and
    ``FLAME_masks.pkl`` — so the full :func:`load_flame` /
    utils/bootstrap.py discovery+install chain is exercisable without the
    licensed FLAME2020 download (reference file formats:
    model/mica/flame.py:52-109, lib/MICA/utils/masking.py:42-60).

    Returns ``{"flame_model": ..., "lmk_embedding": ..., "masks": ...}``.
    """
    import os

    from .masking import synthetic_masks

    rng = np.random.RandomState(seed)
    J = 5
    F = max(2 * n_vertices, 64)
    kintree = np.zeros((2, J), dtype=np.uint32)
    kintree[0] = np.array([4294967295, 0, 1, 1, 1], dtype=np.uint32)
    kintree[1] = np.arange(J, dtype=np.uint32)
    jreg = rng.rand(J, n_vertices).astype(np.float64)
    jreg /= jreg.sum(1, keepdims=True)
    lbs_w = rng.rand(n_vertices, J).astype(np.float64)
    lbs_w /= lbs_w.sum(1, keepdims=True)
    model = {
        "v_template": rng.randn(n_vertices, 3) * 0.1,
        "f": rng.randint(0, n_vertices, size=(F, 3)).astype(np.uint32),
        # the real pickle always carries 300 shape + 100 expression columns;
        # load_flame slices [:n_shape] and [300:]
        "shapedirs": rng.randn(n_vertices, 3, 400) * 1e-2,
        "posedirs": rng.randn(n_vertices, 3, (J - 1) * 9) * 1e-3,
        "kintree_table": kintree,
        "J_regressor": jreg,
        "weights": lbs_w,
    }

    def bary(*shape):
        b = rng.rand(*shape, 3).astype(np.float32)
        return b / b.sum(-1, keepdims=True)

    lmk = {
        "static_lmk_faces_idx": rng.randint(0, F, size=(51,)).astype(np.int64),
        "static_lmk_bary_coords": bary(51),
        "dynamic_lmk_faces_idx": rng.randint(
            0, F, size=(79, 17)).astype(np.int64),
        "dynamic_lmk_bary_coords": bary(79, 17),
        # the real npy stores these with a leading singleton dim
        "full_lmk_faces_idx": rng.randint(0, F, size=(1, 68)).astype(np.int64),
        "full_lmk_bary_coords": bary(1, 68),
    }

    os.makedirs(out_dir, exist_ok=True)
    paths = {
        "flame_model": os.path.join(out_dir, "generic_model.pkl"),
        "lmk_embedding": os.path.join(out_dir, "landmark_embedding.npy"),
        "masks": os.path.join(out_dir, "FLAME_masks.pkl"),
    }
    with open(paths["flame_model"], "wb") as f:
        pickle.dump(model, f)
    np.save(paths["lmk_embedding"], np.asarray(lmk, dtype=object),
            allow_pickle=True)
    with open(paths["masks"], "wb") as f:
        pickle.dump(synthetic_masks(n_vertices, seed=seed), f)
    return paths


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _find_dynamic_lmk_idx_and_bcoords(
    model: FlameModel, full_pose: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Contour-landmark LUT selection by neck y-rotation
    (reference model/mica/flame.py:111-153)."""
    B = full_pose.shape[0]
    aa_pose = full_pose.reshape(B, -1, 3)[:, model.neck_kin_chain]  # [B,K,3]
    rot_mats = lbs_ops.batch_rodrigues(
        aa_pose.reshape(-1, 3)).reshape(B, -1, 3, 3)

    def chain_step(rel, k):
        return jnp.matmul(rot_mats[:, k], rel), None

    rel0 = jnp.broadcast_to(jnp.eye(3, dtype=full_pose.dtype), (B, 3, 3))
    rel_rot_mat, _ = jax.lax.scan(
        chain_step, rel0, jnp.arange(model.neck_kin_chain.shape[0]))

    y_rot_angle = jnp.round(
        jnp.clip(lbs_ops.rot_mat_to_euler(rel_rot_mat) * 180.0 / np.pi,
                 max=39)).astype(jnp.int32)
    neg_mask = (y_rot_angle < 0).astype(jnp.int32)
    mask = (y_rot_angle < -39).astype(jnp.int32)
    neg_vals = mask * 78 + (1 - mask) * (39 - y_rot_angle)
    y_rot_angle = neg_mask * neg_vals + (1 - neg_mask) * y_rot_angle

    return (model.dynamic_lmk_faces_idx[y_rot_angle],
            model.dynamic_lmk_bary_coords[y_rot_angle])


def flame_forward(
    model: FlameModel,
    shape_params: jax.Array,
    expression_params: jax.Array | None = None,
    pose_params: jax.Array | None = None,
    eye_pose_params: jax.Array | None = None,
    neck_pose_params: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """FLAME decode (reference model/mica/flame.py:252-298).

    Returns ``(vertices [B,V,3], landmarks2d [B,68,3], landmarks3d [B,68,3])``
    where landmarks2d uses the pose-dependent dynamic contour and landmarks3d
    the static full 68-point embedding.
    """
    B = shape_params.shape[0]
    f32 = shape_params.dtype
    if pose_params is None:
        pose_params = jnp.zeros((B, 6), f32)
    if eye_pose_params is None:
        eye_pose_params = jnp.zeros((B, 6), f32)
    if neck_pose_params is None:
        neck_pose_params = jnp.zeros((B, 3), f32)
    if expression_params is None:
        expression_params = jnp.zeros((B, model.n_exp), f32)

    betas = jnp.concatenate([shape_params, expression_params], axis=1)
    full_pose = jnp.concatenate(
        [pose_params[:, :3], neck_pose_params, pose_params[:, 3:],
         eye_pose_params], axis=1)

    vertices, _ = lbs_ops.lbs(
        betas, full_pose, model.v_template, model.shapedirs, model.posedirs,
        model.J_regressor, model.parents, model.lbs_weights)

    dyn_faces, dyn_bary = _find_dynamic_lmk_idx_and_bcoords(model, full_pose)
    lmk_faces_idx = jnp.concatenate(
        [dyn_faces,
         jnp.broadcast_to(model.lmk_faces_idx[None],
                          (B,) + model.lmk_faces_idx.shape)], axis=1)
    lmk_bary = jnp.concatenate(
        [dyn_bary,
         jnp.broadcast_to(model.lmk_bary_coords[None],
                          (B,) + model.lmk_bary_coords.shape)], axis=1)

    landmarks2d = lbs_ops.vertices2landmarks(
        vertices, model.faces, lmk_faces_idx, lmk_bary)
    landmarks3d = lbs_ops.vertices2landmarks(
        vertices, model.faces, model.full_lmk_faces_idx,
        model.full_lmk_bary_coords)
    return vertices, landmarks2d, landmarks3d


def compute_landmarks(model: FlameModel, vertices: jax.Array) -> jax.Array:
    """68-point 3D landmarks from decoded vertices
    (reference model/mica/flame.py:188-192)."""
    return lbs_ops.vertices2landmarks(
        vertices, model.faces, model.full_lmk_faces_idx,
        model.full_lmk_bary_coords)


# --------------------------------------------------------------------------
# PCA-basis helpers (reference model/mica/flame.py:200-250)
# --------------------------------------------------------------------------

def project_to_shape_basis(model: FlameModel, shape_vector: jax.Array,
                           shape_as_offset: bool = False) -> jax.Array:
    B = shape_vector.shape[0]
    V = model.n_vertices
    n = model.n_shape
    diff = shape_vector if shape_as_offset else shape_vector - model.v_template
    basis = model.shapedirs[:, :, :n].reshape(3 * V, n)
    return jnp.matmul(diff.reshape(B, -1), basis)


def compute_distance_to_basis(model: FlameModel, shape_vector: jax.Array,
                              shape_as_offset: bool = False) -> jax.Array:
    B = shape_vector.shape[0]
    V = model.n_vertices
    n = model.n_shape
    diff = shape_vector if shape_as_offset else shape_vector - model.v_template
    basis = model.shapedirs[:, :, :n].reshape(V * 3, n)
    params = jnp.matmul(diff.reshape(B, -1), basis)
    return diff - jnp.matmul(params, basis.T).reshape(B, V, 3)


def get_std(model: FlameModel) -> jax.Array:
    basis = model.shapedirs[:, :, :model.n_shape]
    return jnp.linalg.norm(basis.reshape(-1, model.n_shape), axis=0)


def compute_closest_shape(
    model: FlameModel, shape_vector: jax.Array
) -> tuple[jax.Array, jax.Array]:
    B = shape_vector.shape[0]
    V = model.n_vertices
    n = model.n_shape
    basis = model.shapedirs[:, :, :n]
    diff = (shape_vector - model.v_template).reshape(B, -1)
    std = jnp.linalg.norm(basis.reshape(-1, n), axis=0)
    inv = 1.0 / jnp.square(std)
    params = inv * jnp.matmul(diff, basis.reshape(3 * V, n))
    verts = model.v_template + jnp.matmul(
        params, basis.reshape(V * 3, n).T).reshape(B, V, 3)
    return verts, params
