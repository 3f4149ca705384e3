"""Minimal torch oracle modules for parity testing.

These re-express the Vector-Neuron / cylindrical-conv equations (from the
VN paper and the BUFFER reference semantics) with torch CPU ops, using the
reference's *state-dict key names* so real checkpoints load directly.  They
exist only to validate the JAX reimplementation + weight converter; nothing
here is part of the framework.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

EPS = 1e-6


class OVNBatchNorm(nn.Module):
    """BN over vector norms; identity when num_features == 1."""

    def __init__(self, features, dim):
        super().__init__()
        self.features = features
        self.bn = nn.BatchNorm1d(features) if dim in (3, 4) else nn.BatchNorm2d(features)

    def forward(self, x):  # x: [B, C, 3, ...]
        if self.features == 1:
            return x
        norm = torch.norm(x, dim=2) + EPS
        return x / norm.unsqueeze(2) * self.bn(norm).unsqueeze(2)


class OVNLinearLeakyReLU(nn.Module):
    def __init__(self, cin, cout, dim=5, slope=0.2):
        super().__init__()
        self.map_to_feat = nn.Linear(cin, cout, bias=False)
        self.batchnorm = OVNBatchNorm(cout, dim)
        self.map_to_dir = nn.Linear(cin, cout, bias=False)
        self.slope = slope

    def forward(self, x):  # [B, C, 3, ...]
        p = self.map_to_feat(x.transpose(1, -1)).transpose(1, -1)
        p = self.batchnorm(p)
        d = self.map_to_dir(x.transpose(1, -1)).transpose(1, -1)
        dot = (p * d).sum(2, keepdims=True)
        pos = (dot >= 0).float()
        dsq = (d * d).sum(2, keepdims=True)
        return self.slope * p + (1 - self.slope) * (
            pos * p + (1 - pos) * (p - (dot / (dsq + EPS)) * d))


class OVNStdFeature(nn.Module):
    def __init__(self, cin, dim=4):
        super().__init__()
        self.dim = dim
        self.vn1 = OVNLinearLeakyReLU(cin, cin, dim=dim, slope=0.0)
        self.vn2 = OVNLinearLeakyReLU(cin, cin // 2, dim=dim, slope=0.0)
        self.vn_lin = nn.Linear(cin // 2, 3, bias=False)

    def forward(self, x):  # [B, C, 3, N]
        z = self.vn2(self.vn1(x))
        z = self.vn_lin(z.transpose(1, -1)).transpose(1, -1)  # [B,3,3,N]
        z = z.transpose(1, 2)
        std = torch.einsum("bijm,bjkm->bikm", x, z)
        return std.reshape(x.shape[0], -1, x.shape[3])


def OInvariantHead(dim, final):
    """VNStdFeature -> conv1d/IN stack as an nn.Sequential so the torch key
    numbering (0,1,3,5) matches inv_layer / invar_layer directly."""
    return nn.Sequential(
        OVNStdFeature(dim, dim=4),
        nn.Conv1d(dim * 3, dim * 2, 1), nn.InstanceNorm1d(dim * 2),
        nn.Conv1d(dim * 2, dim, 1), nn.InstanceNorm1d(dim),
        nn.Conv1d(dim, 1, 1),
        nn.Sigmoid() if final == "sigmoid" else nn.Softplus())


def pad_cyl2d(x, k):
    p = (k - 1) // 2
    x = torch.cat([x[..., -p:], x, x[..., :p]], dim=3)
    z = torch.zeros_like(x[:, :, :p])
    return torch.cat([z, x, z], dim=2)


def pad_cyl3d(x, k):
    p = (k - 1) // 2
    x = torch.cat([x[..., -p:], x, x[..., :p]], dim=4)
    z = torch.zeros_like(x[:, :, :, :p])
    return torch.cat([z, x, z], dim=3)


class OCylindricalNet(nn.Module):
    """Key names mirror conv_net.ops.N of the reference Cylindrical_Net."""

    def __init__(self):
        super().__init__()
        ops = []
        ops += [nn.Conv3d(16, 64, 3), nn.BatchNorm3d(64, affine=False), nn.ReLU()]
        cur = 64
        for d in (64, 128, 128, 64, 64, 32):
            ops += [nn.Conv2d(cur, d, 3), nn.BatchNorm2d(d, affine=False), nn.ReLU()]
            cur = d
        ops += [nn.Conv2d(32, 32, 3)]
        self.ops = nn.ModuleList(ops)

    def forward(self, x):  # [B,16,3,7,20]
        for op in self.ops:
            if isinstance(op, nn.Conv3d):
                x = op(pad_cyl3d(x, 3))
            elif isinstance(op, nn.Conv2d):
                if x.dim() == 5:
                    x = x.squeeze(2)
                x = op(pad_cyl2d(x, 3))
            else:
                x = op(x)
        return x


class OCostNet(nn.Module):
    def __init__(self):
        super().__init__()
        ops = []
        plan = [(32, 32, (3, 3, 3)), (32, 64, (3, 3, 3)), (64, 64, (3, 1, 3)),
                (64, 128, (3, 1, 3)), (128, 128, (3, 1, 3)), (128, 64, (3, 1, 3)),
                (64, 64, (3, 1, 3)), (64, 32, (3, 1, 3)), (32, 32, (3, 1, 3))]
        for cin, cout, k in plan:
            ops += [nn.Conv3d(cin, cout, k), nn.BatchNorm3d(cout, affine=False),
                    nn.ReLU()]
        ops += [nn.Conv3d(32, 20, (2, 1, 2))]
        self.ops = nn.ModuleList(ops)

    def forward(self, x):  # [B,32,20,5,20]
        for op in self.ops:
            x = op(x)
        return x.reshape(x.shape[0], 20)


def load_subtree(module: nn.Module, merged: dict, prefix: str):
    """Load reference keys with ``prefix`` into ``module`` (oracle names
    must match after stripping the prefix)."""
    sub = {}
    for k, v in merged.items():
        if k.startswith(prefix):
            sub[k[len(prefix):]] = torch.from_numpy(v)
    missing, unexpected = module.load_state_dict(sub, strict=False)
    # num_batches_tracked buffers are allowed to be missing
    real_missing = [m for m in missing if "num_batches_tracked" not in m]
    assert not real_missing, f"missing: {real_missing}"
    assert not unexpected, f"unexpected: {unexpected}"
    return module


# ===========================================================================
# Full-composite oracle (round 2): EFCNN / DetNet over the stacked ragged
# batch form, MiniSpinNet front-end, CostVolume — mirroring the reference
# forward paths so aggregate parity of the whole stack can be bounded
# (models/point_learner.py:122-212, models/patch_embedder.py:47-91,
# models/BUFFER.py:37-66,231-333).
# ===========================================================================


def o_gather(x, idx):
    """reference models/point_learner.py:591 (method-agnostic semantics)."""
    return x[idx]


def o_closest_pool(x, inds):
    """:635 — shadow row appended; first column only."""
    x = torch.cat((x, torch.zeros_like(x[:1, :])), 0)
    return o_gather(x, inds if inds.dim() == 1 else inds[:, 0])


def o_max_pool(x, inds):
    """:650"""
    x = torch.cat((x, torch.zeros_like(x[:1, :])), 0)
    return o_gather(x, inds).max(1)[0]


def _vnn_assemble(x, q_pts, s_pts, neighb_inds, scale, mode):
    """reference VNNBlock.forward gather+concat (:315-405): shadow index ==
    len(s_pts) -> query-point coordinate + zero feature; scale-normalized
    centered offsets; mode '1'/'6' concatenation."""
    N, K = neighb_inds.shape
    s_pts = torch.cat((s_pts, torch.zeros_like(s_pts[:1, :]) + 1e6), 0)
    neighbors = s_pts[neighb_inds, :]
    mask = (neighbors == 1e6)
    neighbors = mask * q_pts[:, None] + neighbors * (~mask)
    eqv = (neighbors - q_pts.unsqueeze(1)) / scale
    x = torch.cat((x, torch.zeros_like(x[:1, :])), 0)
    neighb_x = o_gather(x, neighb_inds)
    if mode == "1":
        inp = torch.cat([neighb_x, eqv], dim=-1)
    elif mode == "6":
        cros = torch.cross(neighb_x, eqv, dim=-1)
        mean = eqv.mean(-2, keepdim=True).repeat([1, K, 1])
        inp = torch.cat([neighb_x, eqv, cros, mean], dim=-1)
    else:
        raise ValueError(mode)
    return inp[None].permute(0, 3, 1, 2).reshape(1, -1, 3, N, K)


class OVNNBlock(nn.Module):
    """'VNN_first' (mode '6', mean pool) — :268-416."""

    def __init__(self, in_dim, out_dim, scale):
        super().__init__()
        self.scale = scale
        self.conv = OVNLinearLeakyReLU(in_dim + 3, out_dim, dim=5)

    def forward(self, x, q_pts, s_pts, neighb_inds):
        inp = _vnn_assemble(x, q_pts, s_pts, neighb_inds, self.scale, "6")
        out = self.conv(inp).mean(dim=-1)          # mean_pool over K
        N = q_pts.shape[0]
        return out.reshape(1, -1, N)[0].transpose(-1, -2)


class OVNNResnetBlock(nn.Module):
    """mode '1' bottleneck resnet — :419-582."""

    def __init__(self, in_dim, out_dim, scale, strided):
        super().__init__()
        self.scale = scale
        self.strided = strided
        self.conv = OVNLinearLeakyReLU(in_dim + 1, out_dim // 2, dim=5)
        self.unary = OVNLinearLeakyReLU(out_dim // 2, out_dim, dim=4)
        self.unary_shortcut = OVNLinearLeakyReLU(in_dim, out_dim, dim=4)

    def forward(self, features, q_pts, s_pts, neighb_inds):
        inp = _vnn_assemble(features, q_pts, s_pts, neighb_inds,
                            self.scale, "1")
        x = self.unary(self.conv(inp).mean(dim=-1))
        shortcut = (o_max_pool(features, neighb_inds) if self.strided
                    else features)
        N = shortcut.shape[0]
        shortcut = shortcut[None].permute(0, 2, 1).reshape(1, -1, 3, N)
        out = x + self.unary_shortcut(shortcut)
        return out.reshape(1, -1, N)[0].transpose(-1, -2)


class OVNBlockPl(nn.Module):
    """decoder 'VN' block — :246-265."""

    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.mlp = OVNLinearLeakyReLU(in_dim, out_dim, dim=4)

    def forward(self, x):
        N = x.shape[0]
        inp = x[None].permute(0, 2, 1).reshape(1, -1, 3, N)
        return self.mlp(inp).reshape(1, -1, N)[0].transpose(-1, -2)


class _ODecoderMixin:
    def _decode(self, bottle, skips, batch):
        skip_x = list(skips)
        x = o_closest_pool(bottle, batch["upsamples"][1])
        x = torch.cat([x, skip_x.pop()], dim=1)
        x = self.decoder_blocks[1](x)
        x = o_closest_pool(x, batch["upsamples"][0])
        x = torch.cat([x, skip_x.pop()], dim=1)
        x = self.decoder_blocks[3](x)
        return x


class OEFCNN(nn.Module, _ODecoderMixin):
    """Full reference EFCNN over the stacked batch dict
    (models/point_learner.py:154-204).  batch: points/neighbors/pools/
    upsamples lists of stacked ragged arrays, shadow index = len."""

    def __init__(self, fd=10, scale=1.0):
        super().__init__()
        self.epsilon = nn.Parameter(torch.tensor(-5.0))  # unused ref param
        self.encoder_blocks = nn.ModuleList([
            OVNNBlock(1, fd, scale),
            OVNNResnetBlock(fd, fd, scale, True),
            OVNNResnetBlock(fd, fd * 2, scale, False),
            OVNNResnetBlock(fd * 2, fd * 2, scale, True),
            OVNNResnetBlock(fd * 2, fd * 4, scale, False),
        ])
        self.decoder_blocks = nn.ModuleList([
            nn.Identity(), OVNBlockPl(fd * 6, fd * 2),
            nn.Identity(), OVNBlockPl(fd * 3, fd),
        ])
        self.fc_layer = nn.Sequential(
            OVNLinearLeakyReLU(fd, fd // 2, dim=4),
            OVNLinearLeakyReLU(fd // 2, 1, dim=4))
        self.inv_layer = OInvariantHead(fd, "sigmoid")

    def forward(self, batch):
        pts, nbrs, pools = batch["points"], batch["neighbors"], batch["pools"]
        x = batch["features"]
        x = self.encoder_blocks[0](x, pts[0], pts[0], nbrs[0])
        skip0 = x
        x = self.encoder_blocks[1](x, pts[1], pts[0], pools[0])
        x = self.encoder_blocks[2](x, pts[1], pts[1], nbrs[1])
        skip1 = x
        x = self.encoder_blocks[3](x, pts[2], pts[1], pools[1])
        x = self.encoder_blocks[4](x, pts[2], pts[2], nbrs[2])
        bottle, skips = x, [skip0, skip1]
        x = self._decode(bottle, skips, batch)
        N = x.shape[0]
        inp = x[None].permute(0, 2, 1).reshape(1, -1, 3, N)
        axis = self.fc_layer(inp).reshape(1, -1, N)[0].transpose(-1, -2)
        eps = self.inv_layer(inp)[0].transpose(-1, -2)
        return axis, eps, {"bottle": bottle, "skips": skips}


class ODetNet(nn.Module, _ODecoderMixin):
    """Reference DetNet (:122-151): independent decoder weights + Softplus
    head run on EFCNN's bottleneck/skips."""

    def __init__(self, fd=10):
        super().__init__()
        self.epsilon = nn.Parameter(torch.tensor(-5.0))  # unused ref param
        self.decoder_blocks = nn.ModuleList([
            nn.Identity(), OVNBlockPl(fd * 6, fd * 2),
            nn.Identity(), OVNBlockPl(fd * 3, fd),
        ])
        self.invar_layer = OInvariantHead(fd, "softplus")

    def forward(self, batch, branch):
        x = self._decode(branch["bottle"], branch["skips"], batch)
        N = x.shape[0]
        inp = x[None].permute(0, 2, 1).reshape(1, -1, 3, N)
        return self.invar_layer(inp)[0].transpose(-1, -2)


class OMiniSpinHead(nn.Module):
    """MiniSpinNet network body (patch_embedder.py:74-91): pnt_layer +
    sample-max + Cylindrical_Net + attention pooling.  Consumes the SPT
    output [K, A, nsample, 3]."""

    def __init__(self, rad_n=3, ele_n=7, azi_n=20):
        super().__init__()
        self.rad_n, self.ele_n, self.azi_n = rad_n, ele_n, azi_n
        self.pnt_layer = nn.Sequential(
            nn.Conv2d(3, 16, 1), nn.BatchNorm2d(16), nn.ReLU(True))
        self.pool_layer = nn.Sequential(
            nn.Conv2d(32, 16, 1), nn.BatchNorm2d(16), nn.ReLU(True),
            nn.Conv2d(16, 1, 1), nn.BatchNorm2d(1), nn.ReLU(True))
        self.conv_net = OCylindricalNet()

    def forward(self, inv_patches):
        K, A, S, _ = inv_patches.shape
        x = inv_patches.permute(0, 3, 1, 2)               # [K,3,A,S]
        x = self.pnt_layer(x)                             # [K,16,A,S]
        x = x.max(dim=-1)[0]                              # max over samples
        x = x.reshape(K, 16, self.rad_n, self.ele_n, self.azi_n)
        x = self.conv_net(x)                              # [K,32,ele,azi]
        w = self.pool_layer(x)                            # [K,1,ele,azi]
        f = (x * w).mean(dim=(2, 3))                      # [K,32]
        desc = F.normalize(f, p=2, dim=-1)
        equi = F.normalize(x, p=2, dim=1)                 # channel-normalized
        return desc, equi


class OCostVolume(nn.Module):
    """Reference CostVolume (models/BUFFER.py:37-66).  Des*: [M,C,k,l]
    (channels-first, reduced elevation band)."""

    def __init__(self, azi_n=20):
        super().__init__()
        self.azi_n = azi_n
        self.conv = OCostNet()

    def forward(self, des1, des2):
        rolls = torch.stack(
            [torch.roll(des1, i, dims=-1) for i in range(self.azi_n)], dim=2)
        cost = rolls - des2.unsqueeze(2)                  # [M,C,20,k,l]
        logits = self.conv(cost)                          # [M,20]
        prob = F.softmax(logits, dim=-1)
        return (prob * torch.arange(self.azi_n)[None]).sum(dim=-1)
