"""Rotation representations, batch-first and jit/vmap friendly.

Counterpart of the reference's ``core/utils/rot_reps.py`` (ortho6d at
rot_reps.py:34-74) and ``core/utils/pose_utils.py`` quaternion utilities,
re-derived for JAX: every function is pure, shape-polymorphic over leading
batch dims via vmap, and safe under jit (no data-dependent control flow).

Conventions:
  * quaternions are (w, x, y, z), not necessarily normalized on input.
  * ortho6d is the first two COLUMNS of the rotation matrix, concatenated:
    [R[:,0]; R[:,1]] (Zhou et al. CVPR'19 continuity representation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Scale-invariant L2 normalization (torch ``F.normalize`` result for
    any non-degenerate input; exact zero maps to zero).

    Direction is scale-free, so divide by max|component| BEFORE the norm:
    the reference's tiny-init heads (normal std=0.001 through 3 convs +
    2 fcs) emit raw rot params down at ~1e-10..1e-20 early in training,
    where a direct f32 norm UNDERFLOWS under XLA's flush-to-zero and an
    eps clamp then returns a visibly non-unit quaternion/column (R R^T
    off by ~1e-2). The additive v/(||v||+1e-8) form was worse still."""
    m = jnp.max(jnp.abs(v), axis=axis, keepdims=True)
    vs = v / jnp.maximum(m, eps)
    return vs / jnp.maximum(jnp.linalg.norm(vs, axis=axis, keepdims=True),
                            eps)


# ---------------------------------------------------------------------------
# ortho6d
# ---------------------------------------------------------------------------

def ortho6d_to_mat(o6d: jax.Array) -> jax.Array:
    """[..., 6] -> [..., 3, 3] via Gram-Schmidt on the two encoded columns."""
    x_raw, y_raw = o6d[..., 0:3], o6d[..., 3:6]
    x = normalize(x_raw)
    z = normalize(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # columns


def mat_to_ortho6d(rot: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 6]: first two columns."""
    return jnp.concatenate([rot[..., :, 0], rot[..., :, 1]], axis=-1)


# ---------------------------------------------------------------------------
# quaternion
# ---------------------------------------------------------------------------

def quat_to_mat(q: jax.Array) -> jax.Array:
    """[..., 4] (w,x,y,z), auto-normalized -> [..., 3, 3]."""
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(rot: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 4] (w,x,y,z), w >= 0.

    Branchless Shepperd's method: compute all four candidate constructions
    and select the best-conditioned one with jnp.where (jit-safe).
    """
    m = rot
    t = jnp.trace(m, axis1=-2, axis2=-1)
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]

    # Four candidates, each scaled by 4*q_i^2 = 1 + 2*m_ii - t style terms.
    qw = jnp.stack(
        [
            1.0 + t,
            m[..., 2, 1] - m[..., 1, 2],
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] - m[..., 0, 1],
        ],
        axis=-1,
    )
    qx = jnp.stack(
        [
            m[..., 2, 1] - m[..., 1, 2],
            1.0 + m00 - m11 - m22,
            m[..., 0, 1] + m[..., 1, 0],
            m[..., 0, 2] + m[..., 2, 0],
        ],
        axis=-1,
    )
    qy = jnp.stack(
        [
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 0, 1] + m[..., 1, 0],
            1.0 + m11 - m00 - m22,
            m[..., 1, 2] + m[..., 2, 1],
        ],
        axis=-1,
    )
    qz = jnp.stack(
        [
            m[..., 1, 0] - m[..., 0, 1],
            m[..., 0, 2] + m[..., 2, 0],
            m[..., 1, 2] + m[..., 2, 1],
            1.0 + m22 - m00 - m11,
        ],
        axis=-1,
    )
    # Pick the construction whose pivot is largest.
    pivots = jnp.stack([1.0 + t, 1.0 + m00 - m11 - m22,
                        1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of (w,x,y,z) quaternions, broadcasting over batch."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# axis-angle
# ---------------------------------------------------------------------------

def axangle_to_mat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rodrigues formula. axis [..., 3] (auto-normalized), angle [...]."""
    axis = normalize(axis)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    C = 1.0 - c
    m = jnp.stack(
        [
            x * x * C + c, x * y * C - z * s, x * z * C + y * s,
            y * x * C + z * s, y * y * C + c, y * z * C - x * s,
            z * x * C - y * s, z * y * C + x * s, z * z * C + c,
        ],
        axis=-1,
    )
    return m.reshape(angle.shape + (3, 3))


def axangle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    axis = normalize(axis)
    half = angle[..., None] / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def log_map(rot: jax.Array, eps: float = 1e-12) -> jax.Array:
    """SO(3) log: [..., 3, 3] -> axis-angle vector [..., 3] (jit-safe).

    Via the quaternion (branchless Shepperd ``mat_to_quat``), which stays
    well-conditioned at angle = pi where the skew-part formulation
    (R - R^T -> 0) collapses a half-turn to the zero vector.
    """
    # mat_to_quat canonicalizes w >= 0, so the angle already lands in
    # [0, pi] — no hemisphere flip needed here
    q = mat_to_quat(rot)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn[..., 0], q[..., 0])
    axis = v / jnp.maximum(vn, eps)
    return axis * angle[..., None]


def exp_map(vec: jax.Array, eps: float = 1e-8) -> jax.Array:
    """SO(3) exp: axis-angle vector [..., 3] -> [..., 3, 3].

    Axis via the scale-invariant :func:`normalize`: the additive
    vec/(angle+eps) form returns a ~0.5-length axis when ||vec|| ~ eps
    (tiny-init PnP heads emit exactly that early in training), and
    axangle_to_mat with a non-unit axis is not a rotation."""
    del eps
    angle = jnp.linalg.norm(vec, axis=-1)
    return axangle_to_mat(normalize(vec), angle)


# ---------------------------------------------------------------------------
# euler (for dataset metadata / symmetry discretization)
# ---------------------------------------------------------------------------

def euler_to_mat(rx: jax.Array, ry: jax.Array, rz: jax.Array) -> jax.Array:
    """EXTRINSIC XYZ euler (= intrinsic ZYX, radians) -> rotation matrix
    R = Rz @ Ry @ Rx (transforms3d ``euler2mat(.., axes='sxyz')``)."""
    zero = jnp.zeros_like(rx)
    one = jnp.ones_like(rx)
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    Rx = jnp.stack([one, zero, zero, zero, cx, -sx, zero, sx, cx],
                   axis=-1).reshape(rx.shape + (3, 3))
    Ry = jnp.stack([cy, zero, sy, zero, one, zero, -sy, zero, cy],
                   axis=-1).reshape(rx.shape + (3, 3))
    Rz = jnp.stack([cz, -sz, zero, sz, cz, zero, zero, zero, one],
                   axis=-1).reshape(rx.shape + (3, 3))
    return Rz @ Ry @ Rx


def angular_distance(r1: jax.Array, r2: jax.Array,
                     eps: float = 0.0) -> jax.Array:
    """Geodesic angle (radians) between rotation matrices [..., 3, 3].

    ``eps=0`` gives the exact metric (identical rotations -> 0). Pass a
    small eps (e.g. 1e-7) when this feeds a LOSS: arccos' gradient is
    infinite at +-1, so training needs the cos clipped strictly inside.
    """
    cos_a = (jnp.trace(jnp.swapaxes(r1, -1, -2) @ r2, axis1=-2, axis2=-1) - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos_a, -1.0 + eps, 1.0 - eps))
