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
