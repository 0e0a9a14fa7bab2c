"""Textures and environment maps.

The reference binds an Rgba8Unorm texture with three samplers (default /
bilinear / nearest, ``/root/reference/src/bindings/texture.rs:134-160``), a
uv-scale uniform with ``fract`` wrapping (``w3e3.wgsl:74``), and lat-long
environment maps with optional RGBE decoding where the exponent rides the
alpha channel (``environment_map``, ``w9e2.wgsl:234-246``). Here a texture is
a plain (H, W, 4) f32 array sampled with vectorized gathers; the sampler is a
mode id matching the UI enum ``TextureUse``
(``/root/reference/src/command.rs:50-55``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tracer.util import pytree_dataclass

# TextureUse ids (command.rs:50-55)
TEX_NONE = 0
TEX_DEFAULT = 1
TEX_BILINEAR = 2
TEX_NEAREST = 3

# Environment-map encodings
ENV_NONE = 0
ENV_LDR = 1  # plain rgb (w9e1: jpg background)
ENV_RGBE = 2  # rgb * 2^(a*255 - 128)  (w9e2.wgsl:242-245)


@pytree_dataclass(static=("kind",))
class TextureBuf:
    data: jnp.ndarray  # (H, W, 4) f32 in [0,1] (RGBE textures keep raw a)
    kind: int = ENV_LDR


def load_image(path: str) -> TextureBuf:
    """Load a png/jpg as an Rgba8Unorm-equivalent float texture."""
    from PIL import Image

    img = Image.open(path).convert("RGBA")
    arr = np.asarray(img, np.float32) / 255.0
    return TextureBuf(data=jnp.asarray(arr), kind=ENV_LDR)


def load_rgbe_png(path: str) -> TextureBuf:
    """Load an ``.hdr.png`` whose alpha stores the shared RGBE exponent."""
    from PIL import Image

    img = Image.open(path).convert("RGBA")
    arr = np.asarray(img, np.float32) / 255.0
    return TextureBuf(data=jnp.asarray(arr), kind=ENV_RGBE)


def _read_radiance_rgbe(path: str) -> np.ndarray:
    """Parse a Radiance ``.hdr`` file to raw (H, W, 4) uint8 RGBE.

    Pure NumPy (no cv2 dependency): handles both adaptive-RLE scanlines
    (the 0x02 0x02 marker format every modern writer emits) and flat
    scanlines. The RGBE bytes are exactly what the reference's
    ``.hdr.png`` stores in its channels (``w9e2.wgsl:242-245``).
    """
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"#?"):
            raise ValueError(f"{path}: not a Radiance file")
        while True:
            line = f.readline()
            if line in (b"\n", b"\r\n", b""):
                break
        res = f.readline().split()
        if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
            raise ValueError(f"{path}: unsupported orientation {res!r}")
        h, w = int(res[1]), int(res[3])
        data = np.frombuffer(f.read(), np.uint8)

    out = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if (
            w >= 8
            and w < 32768
            and data[pos] == 2
            and data[pos + 1] == 2
            and (int(data[pos + 2]) << 8 | int(data[pos + 3])) == w
        ):
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    n = int(data[pos])
                    pos += 1
                    if n > 128:  # run
                        out[y, x : x + n - 128, c] = data[pos]
                        pos += 1
                        x += n - 128
                    else:  # literal
                        out[y, x : x + n, c] = data[pos : pos + n]
                        pos += n
                        x += n
        else:  # flat scanline
            row = data[pos : pos + 4 * w].reshape(w, 4)
            out[y] = row
            pos += 4 * w
    return out


def load_radiance_hdr(path: str) -> TextureBuf:
    """Load a Radiance ``.hdr`` file into RGBE form (decoded at sample
    time exactly like the reference's ``.hdr.png``: rgb * 2^(a*255-128),
    ``w9e2.wgsl:242-245``)."""
    rgbe = _read_radiance_rgbe(path)
    return TextureBuf(
        data=jnp.asarray(rgbe.astype(np.float32) / 255.0), kind=ENV_RGBE
    )


def _decode(texel, kind: int):
    rgb = texel[..., :3]
    if kind == ENV_RGBE:
        exponent = texel[..., 3] * 255.0 - 128.0
        rgb = rgb * jnp.exp2(exponent)[..., None]
    return rgb


def sample_nearest(tex: TextureBuf, u, v):
    """Nearest-texel sample with repeat wrapping; uv in texture space
    (u right, v down — callers flip v as the reference does)."""
    h, w = tex.data.shape[0], tex.data.shape[1]
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)
    x = jnp.clip((uu * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((vv * h).astype(jnp.int32), 0, h - 1)
    return _decode(tex.data[y, x], tex.kind)


def sample_bilinear(tex: TextureBuf, u, v):
    """Bilinear sample with repeat wrapping (4 gathers + lerp)."""
    h, w = tex.data.shape[0], tex.data.shape[1]
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)
    fx = uu * w - 0.5
    fy = vv * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    x1i = jnp.mod(x0i + 1, w)
    y1i = jnp.mod(y0i + 1, h)
    c00 = _decode(tex.data[y0i, x0i], tex.kind)
    c10 = _decode(tex.data[y0i, x1i], tex.kind)
    c01 = _decode(tex.data[y1i, x0i], tex.kind)
    c11 = _decode(tex.data[y1i, x1i], tex.kind)
    top = c00 * (1.0 - tx) + c10 * tx
    bot = c01 * (1.0 - tx) + c11 * tx
    return top * (1.0 - ty) + bot * ty


def sample(tex: TextureBuf, u, v, mode):
    """Sampler-mode dispatch (``w3e4.wgsl:196-216``): Default behaves as the
    linear-filtered sampler, so Default/Bilinear -> bilinear, Nearest ->
    nearest. ``mode`` may be traced; both variants are blended by mask."""
    near = sample_nearest(tex, u, v)
    bilin = sample_bilinear(tex, u, v)
    mode = jnp.asarray(mode)
    return jnp.where((mode == TEX_NEAREST)[..., None], near, bilin)


def environment_map(tex: TextureBuf, direction):
    """Lat-long environment lookup.

    ``u = 0.5*(1 + atan2(x, -z)/pi)``, ``v = acos(-y)/pi``, sampled at
    ``(u, 1 - v)`` (``w9e2.wgsl:234-246``  -- the flip makes v=1 the zenith
    row of the stored image).
    """
    dx, dy, dz = direction[..., 0], direction[..., 1], direction[..., 2]
    u = 0.5 * (1.0 + jnp.arctan2(dx, -dz) / jnp.pi)
    v = jnp.arccos(jnp.clip(-dy, -1.0, 1.0)) / jnp.pi
    return sample_bilinear(tex, u, 1.0 - v)
