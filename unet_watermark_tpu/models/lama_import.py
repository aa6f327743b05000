"""Import path for public big-lama torch checkpoints.

The reference never ships LaMa weights — it downloads them at runtime
through iopaint (/root/reference/src/predict.py:771-777), which a
zero-egress TPU pod cannot. This module closes the gap for users who
already have the public `big-lama` checkpoint (saicinpainting
FFCResNetGenerator, the `models/best.ckpt` state dict or an iopaint
`model.*`-prefixed export): a flax generator whose parameter tree mirrors
the torch module structure one-to-one, plus the state-dict → pytree
mapper.

This generator is intentionally a *different* architecture from
models/lama.py's LamaGenerator (our from-scratch training target):
big-lama uses FFC stages everywhere (ratio_g 0.75, spectral shortcut,
half-spectrum Fourier unit, reflect-padded convs), so a faithful import
needs a faithful structure. Layout/semantics parity with torch primitives
(ConvTranspose2d k3/s2/p1/op1, rfftn/irfftn norm='ortho', reflect-pad
strided convs, eval BatchNorm) is pinned by tests/test_lama_import.py
against torch itself.

Structure of the public checkpoint (ngf=64, n_downsampling=3,
n_blocks=18, resnet ratio_gin/gout=0.75, enable_lfu=false,
add_out_act=sigmoid):

  model.0              ReflectionPad2d(3)                      [no params]
  model.1              FFC_BN_ACT(4→64,   k7, ratio 0→0)
  model.2              FFC_BN_ACT(64→128, k3 s2, ratio 0→0)
  model.3              FFC_BN_ACT(128→256, k3 s2, ratio 0→0)
  model.4              FFC_BN_ACT(256→512, k3 s2, ratio 0→0.75)
  model.5 .. model.22  FFCResnetBlock(512, ratio 0.75)  [conv1, conv2]
  model.23             ConcatTupleLayer                        [no params]
  model.24/27/30       ConvTranspose2d(k3, s2, p1, op1) 512→256→128→64
  model.25/28/31       BatchNorm2d
  model.26/29/32       ReLU                                    [no params]
  model.33             ReflectionPad2d(3)                      [no params]
  model.34             Conv2d(64→3, k7)
  model.35             Sigmoid                                 [no params]

Inside an FFC_BN_ACT: ffc.{convl2l, convl2g, convg2l} are bias-free
convs (reflect padding), ffc.convg2g is a SpectralTransform:
  conv1 = Sequential(Conv1x1 cg→cg/2 no-bias, BN, ReLU)
  fu    = FourierUnit: rfft2(ortho) → interleave (re,im) per channel →
          Conv1x1 2c→2c no-bias + BN + ReLU → de-interleave →
          irfft2(ortho)
  out   = conv2(conv1_out + fu_out)          [Conv1x1 cg/2→cg no-bias]
followed by bn_l / bn_g + ReLU per branch.
"""
from __future__ import annotations

import logging
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .lama import _dft_matrices, idft2_real

logger = logging.getLogger(__name__)

Dtype = Any

NGF = 64
N_DOWN = 3
N_BLOCKS = 18
RATIO_G = 0.75


# ---------------------------------------------------------------------------
# half-spectrum 2D DFT as MXU matmuls (torch.fft.rfftn/irfftn parity)
# ---------------------------------------------------------------------------

def rfft2_matmul(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """torch.fft.rfftn(x, dim=(-2,-1), norm='ortho') over axes (1, 2) of
    a real NHWC array: full DFT over H, half spectrum (W//2+1) over W.
    Dense-DFT matmul form (FFT custom-calls are unimplemented on this
    image's TPU backend; at the FFC /8 resolution matmuls are fast).
    Returns (real, imag), each (N, H, W//2+1, C) fp32."""
    h, w = x.shape[1], x.shape[2]
    ch_, sh_ = _dft_matrices(h)
    cw_, sw_ = _dft_matrices(w)
    w2 = w // 2 + 1
    cwh, swh = cw_[:w2], sw_[:w2]
    x = x.astype(jnp.float32)
    ar = jnp.einsum("hk,nkwc->nhwc", ch_, x)
    ai = jnp.einsum("hk,nkwc->nhwc", sh_, x)
    br = jnp.einsum("wk,nhkc->nhwc", cwh, ar) - \
        jnp.einsum("wk,nhkc->nhwc", swh, ai)
    bi = jnp.einsum("wk,nhkc->nhwc", swh, ar) + \
        jnp.einsum("wk,nhkc->nhwc", cwh, ai)
    return br, bi


def irfft2_matmul(real: jax.Array, imag: jax.Array, w: int) -> jax.Array:
    """torch.fft.irfftn(X, s=(h, w), dim=(-2,-1), norm='ortho'): rebuild
    the full-W spectrum by Hermitian symmetry
    X[kh, kw] = conj(X[(h-kh) % h, w-kw]) and invert with the orthonormal
    full 2D DFT (real part)."""
    w2 = real.shape[2]

    def conj_rev_h(a):
        # index map kh -> (h-kh) % h: row 0 stays, rest reversed
        return jnp.concatenate([a[:, :1], a[:, 1:][:, ::-1]], axis=1)

    tail_r = conj_rev_h(real[:, :, 1:w - w2 + 1])[:, :, ::-1]
    tail_i = -conj_rev_h(imag[:, :, 1:w - w2 + 1])[:, :, ::-1]
    full_r = jnp.concatenate([real, tail_r], axis=2)
    full_i = jnp.concatenate([imag, tail_i], axis=2)
    return idft2_real(full_r, full_i)


def _reflect_conv(x, conv: nn.Module, pad: int):
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode="reflect")
    return conv(x)


# ---------------------------------------------------------------------------
# modules (names chosen so the flax param tree maps 1:1 onto torch keys)
# ---------------------------------------------------------------------------

class FourierUnit(nn.Module):
    """saicinpainting FourierUnit (enable_lfu=false): spectral 1x1 conv on
    per-channel interleaved (real, imag) planes. Channel layout after the
    stack/permute/flatten in torch is [c0_re, c0_im, c1_re, c1_im, ...] —
    the conv weight import depends on matching it exactly."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        r, i = rfft2_matmul(x)
        y = jnp.stack([r, i], axis=-1).reshape(n, h, w // 2 + 1, 2 * c)
        y = nn.Conv(2 * self.channels, (1, 1), use_bias=False,
                    dtype=jnp.float32, name="conv_layer")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(y)
        y = nn.relu(y)
        y = y.reshape(n, h, w // 2 + 1, self.channels, 2)
        return irfft2_matmul(y[..., 0], y[..., 1], w).astype(x.dtype)


class SaicSpectralTransform(nn.Module):
    """SpectralTransform, stride 1, enable_lfu=false:
    out = conv2(conv1(x) + fu(conv1(x)))."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.out_channels // 2
        x = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1_0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="conv1_1")(x)
        x = nn.relu(x)
        y = FourierUnit(half, dtype=self.dtype, name="fu")(x, train)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       dtype=self.dtype, name="conv2")(x + y)


class SaicFFC(nn.Module):
    """FFC cross-connections. Branch convs are bias-free, reflect-padded.
    A branch conv only exists when both its input and output sides have
    channels (torch uses nn.Identity otherwise — no params)."""

    in_cl: int
    in_cg: int
    out_cl: int
    out_cg: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        conv = lambda ch, name: nn.Conv(
            ch, (self.kernel, self.kernel), strides=(self.stride,) * 2,
            padding="VALID", use_bias=False, dtype=self.dtype, name=name)
        out_l = out_g = None
        if self.in_cl and self.out_cl:
            out_l = _reflect_conv(x_l, conv(self.out_cl, "convl2l"),
                                  self.pad)
        if self.in_cg and self.out_cl:
            t = _reflect_conv(x_g, conv(self.out_cl, "convg2l"), self.pad)
            out_l = t if out_l is None else out_l + t
        if self.in_cl and self.out_cg:
            out_g = _reflect_conv(x_l, conv(self.out_cg, "convl2g"),
                                  self.pad)
        if self.in_cg and self.out_cg:
            t = SaicSpectralTransform(self.out_cg, dtype=self.dtype,
                                      name="convg2g")(x_g, train)
            out_g = t if out_g is None else out_g + t
        return out_l, out_g


class FFCBnAct(nn.Module):
    """FFC_BN_ACT: ffc → per-branch BatchNorm → ReLU."""

    in_cl: int
    in_cg: int
    out_cl: int
    out_cg: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        out_l, out_g = SaicFFC(
            self.in_cl, self.in_cg, self.out_cl, self.out_cg,
            kernel=self.kernel, stride=self.stride, pad=self.pad,
            dtype=self.dtype, name="ffc")(x_l, x_g, train)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        if out_l is not None:
            out_l = nn.relu(bn("bn_l")(out_l))
        if out_g is not None:
            out_g = nn.relu(bn("bn_g")(out_g))
        return out_l, out_g


class SaicFFCResBlock(nn.Module):
    """FFCResnetBlock: two FFC_BN_ACTs + per-branch residual."""

    channels: int
    ratio_g: float = RATIO_G
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        cg = int(self.channels * self.ratio_g)
        cl = self.channels - cg
        id_l, id_g = x_l, x_g
        x_l, x_g = FFCBnAct(cl, cg, cl, cg, dtype=self.dtype,
                            name="conv1")(x_l, x_g, train)
        x_l, x_g = FFCBnAct(cl, cg, cl, cg, dtype=self.dtype,
                            name="conv2")(x_l, x_g, train)
        return id_l + x_l, id_g + x_g


def _conv_transpose_torch(features: int, name: str) -> nn.ConvTranspose:
    """torch.nn.ConvTranspose2d(k=3, stride=2, padding=1,
    output_padding=1) parity: lhs-dilate by 2, pad (1, 2), correlate.
    The imported kernel is pre-flipped spatially (torch's transposed conv
    convolves; lax correlates), see import_big_lama."""
    return nn.ConvTranspose(features, (3, 3), strides=(2, 2),
                            padding=((1, 2), (1, 2)), use_bias=True,
                            dtype=jnp.float32, name=name)


class BigLamaGenerator(nn.Module):
    """FFCResNetGenerator with the public big-lama hyperparameters.
    __call__ signature matches models/lama.LamaGenerator so the engine
    registry (inference/engines.py) can use either interchangeably."""

    ngf: int = NGF
    n_blocks: int = N_BLOCKS
    ratio_g: float = RATIO_G
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, mask, train: bool = False):
        ngf = self.ngf
        x = jnp.concatenate([image * (1.0 - mask), mask],
                            axis=-1).astype(self.dtype)
        # model.0 ReflectionPad2d(3) + model.1 FFC_BN_ACT(4→ngf, k7)
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        x_l, x_g = FFCBnAct(4, 0, ngf, 0, kernel=7, pad=0,
                            dtype=self.dtype, name="model_1")(x, None, train)
        # downsampling: the LAST one splits out the global branch
        ch = ngf
        for i in range(N_DOWN):
            out_ch = ch * 2
            out_cg = int(out_ch * self.ratio_g) if i == N_DOWN - 1 else 0
            x_l, x_g = FFCBnAct(
                ch, 0, out_ch - out_cg, out_cg, kernel=3, stride=2, pad=1,
                dtype=self.dtype, name=f"model_{2 + i}")(x_l, x_g, train)
            ch = out_ch
        for i in range(self.n_blocks):
            x_l, x_g = SaicFFCResBlock(
                ch, self.ratio_g, dtype=self.dtype,
                name=f"model_{2 + N_DOWN + i}")(x_l, x_g, train)
        x = jnp.concatenate([x_l, x_g], axis=-1)  # ConcatTupleLayer
        base = 2 + N_DOWN + self.n_blocks + 1  # first ConvTranspose index
        for i in range(N_DOWN):
            ch //= 2
            x = _conv_transpose_torch(ch, name=f"model_{base + 3 * i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"model_{base + 3 * i + 1}")(x)
            x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        x = nn.Conv(3, (7, 7), padding="VALID", dtype=self.dtype,
                    name=f"model_{base + 3 * N_DOWN + 1}")(x)
        out = nn.sigmoid(x.astype(jnp.float32))
        return out * mask + image * (1.0 - mask)


def init_big_lama(model: BigLamaGenerator, img_size: int = 64, seed: int = 0):
    rng = jax.random.PRNGKey(seed)
    img = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    msk = jnp.zeros((1, img_size, img_size, 1), jnp.float32)
    return model.init(rng, img, msk, train=False)


# ---------------------------------------------------------------------------
# state-dict mapping
# ---------------------------------------------------------------------------

def _conv_transpose_indices(n_blocks: int = N_BLOCKS) -> set:
    base = 2 + N_DOWN + n_blocks + 1
    return {base + 3 * i for i in range(N_DOWN)}


def _torch_lama_name(path: Tuple[str, ...], collection: str
                     ) -> Optional[str]:
    """Flax param path → torch state_dict key (no prefix)."""
    leaf = path[-1]
    leaf_map = ({"kernel": "weight", "scale": "weight", "bias": "bias"}
                if collection == "params" else
                {"mean": "running_mean", "var": "running_var"})
    if leaf not in leaf_map:
        return None
    segs: List[str] = []
    for p in path[:-1]:
        m = re.fullmatch(r"model_(\d+)", p)
        if m:
            segs.extend(["model", m.group(1)])
        elif re.fullmatch(r"conv1_[01]", p):
            segs.extend(["conv1", p[-1]])
        else:
            segs.append(p)
    return ".".join(segs + [leaf_map[leaf]])


def _flatten(tree: Any, prefix: Tuple[str, ...] = ()
             ) -> Dict[Tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for path, value in flat.items():
        node = root
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = value
    return root


def normalize_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip training-harness prefixes: a saicinpainting best.ckpt carries
    'generator.model.*' (plus discriminator/loss tensors we drop); an
    iopaint export carries bare 'model.*'."""
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        if k.startswith("generator."):
            k = k[len("generator."):]
        if k.startswith("model."):
            out[k] = v
    return out


def import_big_lama(sd: Dict[str, np.ndarray], variables,
                    n_blocks: int = N_BLOCKS
                    ) -> Tuple[dict, Dict[str, list]]:
    """Map a (normalized or raw) big-lama state dict onto a
    BigLamaGenerator variables tree. Returns (new_variables, report);
    report lists loaded / missing (ours, absent in the file) / unused
    (file generator keys not consumed).

    Layout transforms: conv OIHW→HWIO; ConvTranspose2d (in,out,kh,kw)
    → spatial flip + (kh,kw,in,out) because torch's transposed conv
    convolves with the kernel while lax.conv_transpose(transpose_kernel=
    False) correlates (parity-tested vs torch in
    tests/test_lama_import.py)."""
    sd = normalize_state_dict(sd)
    ct_idx = _conv_transpose_indices(n_blocks)
    used = set()
    report: Dict[str, list] = {"loaded": [], "missing": [], "unused": []}
    new_colls = {}
    for coll in ("params", "batch_stats"):
        flat = _flatten(variables.get(coll, {}))
        new_flat = {}
        for p, v in flat.items():
            name = _torch_lama_name(p, coll)
            arr = None
            if name is not None and name in sd:
                src = np.asarray(sd[name], np.float32)
                tgt_shape = tuple(np.shape(v))
                is_ct = (coll == "params" and p[-1] == "kernel"
                         and re.fullmatch(r"model_(\d+)", p[0])
                         and int(p[0].split("_")[1]) in ct_idx)
                if src.ndim == 4 and is_ct:
                    cand = np.transpose(src[:, :, ::-1, ::-1], (2, 3, 0, 1))
                elif src.ndim == 4:
                    cand = np.transpose(src, (2, 3, 1, 0))
                else:
                    cand = src
                if tuple(cand.shape) == tgt_shape:
                    arr = cand
                    used.add(name)
            if arr is not None:
                new_flat[p] = np.asarray(
                    arr, dtype=np.asarray(
                        v).dtype if not hasattr(v, "dtype") else v.dtype)
                report["loaded"].append(name)
            else:
                new_flat[p] = v
                report["missing"].append(".".join(p))
        new_colls[coll] = _unflatten(new_flat)
    report["unused"] = sorted(
        k for k in sd if k not in used and "num_batches_tracked" not in k)
    new_vars = dict(variables)
    new_vars.update(new_colls)
    logger.info("big-lama import: %d loaded, %d missing, %d unused",
                len(report["loaded"]), len(report["missing"]),
                len(report["unused"]))
    return new_vars, report


def load_big_lama(path: str, dtype: Dtype = jnp.float32,
                  img_size: int = 64):
    """One-call loader: torch checkpoint file → (model, variables, report).

    Accepts the saicinpainting training checkpoint (best.ckpt with
    'generator.*' keys) or a bare/iopaint state dict. Raises ValueError
    when the file is not a big-lama generator (e.g. zero keys map)."""
    from .torch_import import load_pth

    sd = load_pth(path)
    model = BigLamaGenerator(dtype=dtype)
    variables = init_big_lama(model, img_size=img_size)
    variables, report = import_big_lama(sd, variables)
    if not report["loaded"] or report["missing"]:
        raise ValueError(
            f"{path} does not match the big-lama generator layout "
            f"({len(report['loaded'])} loaded, "
            f"{len(report['missing'])} missing)")
    return model, variables, report
