"""Import reference torch checkpoints (`scannet_540ep.pth` layout) into
vdetr_tpu parameter trees.

The reference checkpoint is `{model, optimizer, epoch, args,
best_val_metrics}` (utils/io.py:23-29); `model` is a torch state_dict
whose names follow models/model_vdetr.py + models/vdetr_transformer.py +
models/mink_resnet.py. This module maps every tensor:

- torch Linear (out, in)        -> Dense kernel (in, out)          [T]
- torch Conv1d k=1 (out, in, 1) -> Dense kernel (in, out)          [squeeze+T]
- torch BatchNorm/LayerNorm     -> scale/bias (+ batch_stats)
- MinkowskiConvolution kernel (K, C_in, C_out) -> SparseConv kernel
  (same layout; `KERNEL_OFFSET_PERMUTATION` hooks any offset-order
  difference between MinkowskiEngine's region iteration and ours —
  identity by default, verified empirically when a real checkpoint is
  available)
- nn.MultiheadAttention packed in_proj (3*dim, dim) -> split q/k/v

`build_reference_state_dict` produces a reference-shaped state dict from
one of our parameter trees (the exact inverse), used for round-trip
self-tests and for exporting checkpoints back to the torch layout.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from vdetr_tpu.config import VDETRConfig

# ME kernel-offset order mapping. Keyed by kernel volume: 27 for the
# 3^3 convs, 8 for the 2^3 FPN transpose convs. Applied as
# k_ours = k_torch[perm], i.e. perm[our_index] = ME index of the SAME
# geometric offset.
#
# STATUS (round 5): pinned ANALYTICALLY from MinkowskiEngine's public
# kernel-region enumeration (src/kernel_region.hpp in ME 0.5.x, the
# version the reference pins):
#
#   * `kernel_region::coordinate_at(index, dst)` decodes a kernel index
#     by `dst[axis+1] = lower[axis+1] + (index % size[axis]) * dilation`
#     with the axis loop ASCENDING and `index /= size[axis]` each step,
#     and the region iterator's operator++ advances the same way (first
#     spatial axis first, carry to the next on overflow). Coordinates
#     in ME are (batch, x, y, z), so the FIRST spatial coordinate (x)
#     varies FASTEST: ME index m = ix + 3*iy + 9*iz for kernel 3.
#   * Each axis is enumerated lower→upper: offsets -r..r for odd
#     kernels (lower = -(k-1)/2 * dilation) and 0..k-1 for even kernels
#     (integer division makes the even-kernel region one-sided — ME's
#     documented asymmetric even-kernel behavior). No sign flips.
#   * Weight slot 0 therefore multiplies the input at offset
#     (-r,-r,-r), exactly as in torch's cross-correlation Conv3d — the
#     same input-gather convention as ops/sparse_conv._gather_matmul,
#     so enumeration order is the ONLY difference.
#
# Our enumeration (ops/sparse_conv._offsets and the transpose-conv slot
# k = (ix*2+iy)*2+iz) is z-fastest over the same offset sets, so the
# mapping is the base-k 3-digit REVERSAL (an involution):
# perm[ix*k^2 + iy*k + iz] = iz*k^2 + iy*k + ix.
#
# Empirical backstop (the analytic pin's failure mode is ME changing
# enumeration between versions): `tools/verify_port.py verify
# --search-perm` searches all 48 axis-order/sign relabelings against a
# golden generated in an ME-capable environment
# (tools/reference_golden.py); every module downstream of the backbone
# is already verified numerically against the reference's own torch
# code (tests/test_reference_module_parity.py).


def _digit_reversal_perm(kernel_size: int) -> np.ndarray:
    """perm[our z-fastest index] = ME x-fastest index, same offset."""
    k = kernel_size
    perm = np.empty(k ** 3, np.int64)
    for ix in range(k):
        for iy in range(k):
            for iz in range(k):
                perm[(ix * k + iy) * k + iz] = (iz * k + iy) * k + ix
    return perm


KERNEL_OFFSET_PERMUTATION: Optional[Dict[int, np.ndarray]] = {
    27: _digit_reversal_perm(3),
    8: _digit_reversal_perm(2),
}


def _offset_perm(k: np.ndarray) -> Optional[np.ndarray]:
    if KERNEL_OFFSET_PERMUTATION is None or k.shape[0] <= 1:
        return None
    return KERNEL_OFFSET_PERMUTATION.get(k.shape[0])


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class _Mapper:
    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = {k: _np(v) for k, v in sd.items()}
        self.params: Dict = {}
        self.stats: Dict = {}
        self.used = set()
        self.missing = []

    def take(self, name):
        if name not in self.sd:
            self.missing.append(name)
            return None
        self.used.add(name)
        return self.sd[name]

    def linear(self, tname, path, bias=True):
        w = self.take(tname + ".weight")
        if w is not None:
            _set(self.params, path + ("kernel",), w.T)
        if bias:
            b = self.take(tname + ".bias")
            if b is not None:
                _set(self.params, path + ("bias",), b)

    def conv1d(self, tname, path, bias=True):
        w = self.take(tname + ".weight")
        if w is not None:
            _set(self.params, path + ("kernel",), w[:, :, 0].T)
        if bias:
            b = self.take(tname + ".bias")
            if b is not None:
                _set(self.params, path + ("bias",), b)

    def norm(self, tname, path, stats=True):
        """BatchNorm (with running stats) or LayerNorm (without)."""
        w = self.take(tname + ".weight")
        b = self.take(tname + ".bias")
        if w is not None:
            _set(self.params, path + ("scale",), w)
        if b is not None:
            _set(self.params, path + ("bias",), b)
        if stats:
            m = self.take(tname + ".running_mean")
            v = self.take(tname + ".running_var")
            if m is not None:
                _set(self.stats, path + ("mean",), m)
            if v is not None:
                _set(self.stats, path + ("var",), v)

    def mink_kernel(self, tname, path):
        k = self.take(tname + ".kernel")
        if k is not None:
            if k.ndim == 2:  # kernel_size 1 convs are stored (C_in, C_out)
                k = k[None]
            perm = _offset_perm(k)
            if perm is not None:
                k = k[perm]
            _set(self.params, path + ("kernel",), k)

    def raw(self, tname, path):
        v = self.take(tname)
        if v is not None:
            _set(self.params, path, v)

    def packed_qkv(self, tname, path):
        w = self.take(tname + ".in_proj_weight")
        b = self.take(tname + ".in_proj_bias")
        if w is not None:
            dim = w.shape[0] // 3
            for j, nm in enumerate(("q", "k", "v")):
                _set(self.params, path + (nm, "kernel"),
                     w[j * dim:(j + 1) * dim].T)
                if b is not None:
                    _set(self.params, path + (nm, "bias"),
                         b[j * dim:(j + 1) * dim])


def _map_generic_mlp(m: _Mapper, tname: str, path, n_hidden: int = 2,
                     norm: bool = True):
    """GenericMLP Sequential indices: conv,bn,act,drop per hidden + out conv
    (reference models/helpers.py:102-128)."""
    step = 4 if norm else 3  # conv, bn, act, dropout vs conv, act, dropout
    idx = 0
    for h in range(n_hidden):
        m.conv1d(f"{tname}.layers.{idx}", path + (f"layer{h}",), bias=False)
        if norm:
            m.norm(f"{tname}.layers.{idx + 1}", path + (f"norm{h}",))
        idx += step
    m.conv1d(f"{tname}.layers.{idx}", path + ("out",))


def _map_proj(m: _Mapper, cfg: VDETRConfig):
    base = "encoder_to_decoder_projection"
    path = ("encoder_to_decoder_projection",)
    if cfg.proj_nohid:
        # [conv(no bias), bn, relu]
        m.conv1d(f"{base}.layers.0", path + ("out",), bias=False)
        m.norm(f"{base}.layers.1", path + ("normout",))
    else:
        m.conv1d(f"{base}.layers.0", path + ("layer0",), bias=False)
        m.norm(f"{base}.layers.1", path + ("norm0",))
        m.conv1d(f"{base}.layers.4", path + ("out",), bias=False)
        m.norm(f"{base}.layers.5", path + ("normout",))


def _map_pos_embed(m: _Mapper, tname: str, path):
    """PositionEmbeddingLearned: conv(0), bn(1), relu(2), conv(3)
    (reference models/helpers.py:22-28)."""
    m.conv1d(f"{tname}.position_embedding_head.0", path + ("layer0",))
    m.norm(f"{tname}.position_embedding_head.1", path + ("norm0",))
    m.conv1d(f"{tname}.position_embedding_head.3", path + ("out",))


def _map_backbone(m: _Mapper, cfg: VDETRConfig):
    arch = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
            101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[cfg.depth]
    bottleneck = cfg.depth >= 50
    p = ("pre_encoder",)
    m.mink_kernel("pre_encoder.conv1", p + ("conv1",))
    m.norm("pre_encoder.norm1.bn" if cfg.stem_bn else "pre_encoder.norm1",
           p + ("norm1",), stats=cfg.stem_bn)
    for i in range(cfg.num_stages):
        for b in range(arch[i]):
            t = f"pre_encoder.layer{i + 1}.{b}"
            q = p + (f"layer{i + 1}_block{b}",)
            convs = ("conv1", "conv2", "conv3") if bottleneck \
                else ("conv1", "conv2")
            for j, cname in enumerate(convs, start=1):
                m.mink_kernel(f"{t}.{cname}", q + (cname,))
                m.norm(f"{t}.norm{j}.bn", q + (f"norm{j}",))
            if f"{t}.downsample.0.kernel" in m.sd:
                m.mink_kernel(f"{t}.downsample.0", q + ("downsample_conv",))
                m.norm(f"{t}.downsample.1.bn", q + ("downsample_norm",))


def _map_fpn(m: _Mapper, cfg: VDETRConfig):
    for i in range(cfg.layer_idx + 1, cfg.num_stages):
        t = f"up_block_{i}"
        q = (f"up_block_{i}",)
        m.mink_kernel(f"{t}.0", q + ("up_conv",))
        m.norm(f"{t}.1.bn", q + ("up_norm",))
        m.mink_kernel(f"{t}.3", q + ("conv",))
        m.norm(f"{t}.4.bn", q + ("norm",))
    t = f"out_block_{cfg.layer_idx}"
    m.mink_kernel(f"{t}.0", (t, "conv"))
    m.norm(f"{t}.1.bn", (t, "norm"))


def _map_decoder(m: _Mapper, cfg: VDETRConfig):
    d = ("decoder",)
    num_layers = cfg.dec_nlayers - 1
    m.linear("decoder.first_layer.linear1", d + ("first_layer", "linear1"))
    m.linear("decoder.first_layer.linear2", d + ("first_layer", "linear2"))
    m.norm("decoder.first_layer.norm", d + ("first_layer", "norm"),
           stats=False)
    m.norm("decoder.norm", d + ("norm",), stats=False)
    if cfg.q_content in ("random", "random_add"):
        m.raw("decoder.query_embed.weight", d + ("query_embed",))

    for i in range(num_layers):
        _map_pos_embed(m, f"decoder.query_pos_projection.{i}",
                       d + (f"query_pos_projection{i}",))
        t = f"decoder.layers.{i}"
        q = d + (f"layer{i}",)
        # self-attn: packed torch MultiheadAttention
        if cfg.share_selfattn:
            for nm in ("q", "k", "v"):
                m.linear(f"{t}.self_attn.{nm}", q + ("self_attn", nm))
            m.linear(f"{t}.self_attn.proj", q + ("self_attn", "proj"))
        else:
            m.packed_qkv(f"{t}.self_attn", q + ("self_attn",))
            m.linear(f"{t}.self_attn.out_proj",
                     q + ("self_attn", "out_proj"))
        # cross attn
        for nm in ("q", "k", "v", "proj"):
            m.linear(f"{t}.multihead_attn.{nm}", q + ("cross_attn", nm))
        for j in range(8):
            m.linear(f"{t}.multihead_attn.cpb_mlps.{j}.0",
                     q + ("cross_attn", f"cpb_mlp{j}", "fc1"))
            m.linear(f"{t}.multihead_attn.cpb_mlps.{j}.2",
                     q + ("cross_attn", f"cpb_mlp{j}", "fc2"), bias=False)
        for n in (1, 2, 3):
            m.norm(f"{t}.norm{n}", q + (f"norm{n}",), stats=False)
        m.linear(f"{t}.linear1", q + ("linear1",))
        m.linear(f"{t}.linear2", q + ("linear2",))

    heads = ["sem_cls", "center", "size", "angle_cls", "angle_residual"]
    for i in range(num_layers + 1):
        for h in heads:
            _map_generic_mlp(
                m, f"decoder.mlp_heads.{i}.{h}_head",
                d + (f"mlp_heads{i}", f"{h}_head"),
            )
    _map_generic_mlp(m, "decoder.pointcls_heads",
                     ("pointcls_heads", "head"))


def convert_torch_state_dict(sd: Dict, cfg: VDETRConfig
                             ) -> Tuple[Dict, Dict, Dict]:
    """torch state_dict -> (params, batch_stats, report)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    m = _Mapper(sd)
    _map_backbone(m, cfg)
    _map_fpn(m, cfg)
    _map_proj(m, cfg)
    _map_decoder(m, cfg)
    unused = sorted(set(m.sd) - m.used)
    # num_batches_tracked etc. are expected leftovers
    unused = [u for u in unused if not u.endswith("num_batches_tracked")]
    report = {"missing": m.missing, "unused": unused}
    return m.params, m.stats, report


def load_reference_checkpoint(path: str, cfg: VDETRConfig):
    """Load a reference-format .pth (requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    params, stats, report = convert_torch_state_dict(sd, cfg)
    meta = {k: ckpt.get(k) for k in ("epoch", "best_val_metrics")}
    return params, stats, report, meta


def reference_args_to_config(ckpt_args, base_cfg: VDETRConfig,
                             ignore_keys=()) -> VDETRConfig:
    """Map the argparse Namespace pickled inside a reference checkpoint
    (`ckpt["args"]`, utils/io.py:23-29) onto VDETRConfig — the .pth
    equivalent of `--auto_test` arg restoration (reference main.py:218-233).

    Same-named fields are copied; reference-only infra flags (ngpus,
    dist_url, ...) and `ignore_keys` (the reference's auto_reload ignore
    list: test/NMS/IO flags stay from the CLI) are skipped; TPU-only
    fields (voxel_capacity, mesh_*, ...) keep `base_cfg` values."""
    import dataclasses

    ns = dict(ckpt_args) if isinstance(ckpt_args, dict) else vars(ckpt_args)
    fields = {f.name for f in dataclasses.fields(VDETRConfig)}
    kw = {}
    for k, v in ns.items():
        if k in ignore_keys or k not in fields:
            continue
        if v is None and isinstance(getattr(base_cfg, k), str):
            v = ""  # argparse default-None strings (angle_type etc.)
        kw[k] = v
    return base_cfg.replace(**kw)


# --------------------------------------------------------------------------
# Inverse direction (for round-trip tests / export)
# --------------------------------------------------------------------------

def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def build_reference_state_dict(params: Dict, batch_stats: Dict,
                               cfg: VDETRConfig) -> Dict[str, np.ndarray]:
    """Our (params, batch_stats) -> reference-shaped torch state dict.
    Exact inverse of convert_torch_state_dict (validated by round trip)."""
    flat_p = _flatten(params)
    flat_s = _flatten(batch_stats)
    sd: Dict[str, np.ndarray] = {}

    # Build the name map by running the forward mapping on a "recording"
    # state dict: we first enumerate torch names via a dry converter.
    rec = _RecordingMapper()
    _map_backbone(rec, cfg)
    _map_fpn(rec, cfg)
    _map_proj(rec, cfg)
    _map_decoder(rec, cfg)

    for tname, (path, kind) in rec.param_map.items():
        if path not in flat_p:
            continue
        v = flat_p[path]
        if kind == "linear_w":
            sd[tname] = v.T
        elif kind == "conv1d_w":
            sd[tname] = v.T[:, :, None]
        elif kind == "mink":
            perm = _offset_perm(v)
            if perm is not None:
                v = v[np.argsort(perm)]
            sd[tname] = v
        elif kind == "packed_qkv":
            base = path[:-2]
            q = flat_p[base + ("q", "kernel")].T
            k = flat_p[base + ("k", "kernel")].T
            vv = flat_p[base + ("v", "kernel")].T
            sd[tname] = np.concatenate([q, k, vv], 0)
        elif kind == "packed_qkv_bias":
            base = path[:-2]
            q = flat_p[base + ("q", "bias")]
            k = flat_p[base + ("k", "bias")]
            vv = flat_p[base + ("v", "bias")]
            sd[tname] = np.concatenate([q, k, vv], 0)
        else:
            sd[tname] = v
    for tname, path in rec.stats_map.items():
        if path in flat_s:
            sd[tname] = flat_s[path]
    return sd


class _RecordingMapper:
    """Records (torch name -> (our path, kind)) without any data."""

    def __init__(self):
        self.sd = _AlwaysContains()
        self.param_map = {}
        self.stats_map = {}
        self.missing = []
        self.used = set()

    def take(self, name):
        return None

    def linear(self, tname, path, bias=True):
        self.param_map[tname + ".weight"] = (path + ("kernel",), "linear_w")
        if bias:
            self.param_map[tname + ".bias"] = (path + ("bias",), "raw")

    def conv1d(self, tname, path, bias=True):
        self.param_map[tname + ".weight"] = (path + ("kernel",), "conv1d_w")
        if bias:
            self.param_map[tname + ".bias"] = (path + ("bias",), "raw")

    def norm(self, tname, path, stats=True):
        self.param_map[tname + ".weight"] = (path + ("scale",), "raw")
        self.param_map[tname + ".bias"] = (path + ("bias",), "raw")
        if stats:
            self.stats_map[tname + ".running_mean"] = path + ("mean",)
            self.stats_map[tname + ".running_var"] = path + ("var",)

    def mink_kernel(self, tname, path):
        self.param_map[tname + ".kernel"] = (path + ("kernel",), "mink")

    def raw(self, tname, path):
        self.param_map[tname] = (path, "raw")

    def packed_qkv(self, tname, path):
        self.param_map[tname + ".in_proj_weight"] = (
            path + ("q", "kernel"), "packed_qkv")
        self.param_map[tname + ".in_proj_bias"] = (
            path + ("q", "bias"), "packed_qkv_bias")


class _AlwaysContains:
    def __contains__(self, k):
        return True
