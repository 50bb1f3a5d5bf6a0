"""Pure-torch replica of the reference DS sign_inv protocol (experiment only).
Loads init params exported from the flax model, runs N epochs on one image,
prints the loss curve."""
import sys
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

npz = np.load(sys.argv[1])
img = int(sys.argv[2]); epochs = int(sys.argv[3])
torch.manual_seed(0)

import scipy.io as sio, scipy.sparse as sp
mat = sio.loadmat('/root/repo/data/2dgrid/2Dgrid.mat')
A = sp.csr_matrix(mat['A']); n = A.shape[0]
x_all = np.asarray(mat['F'], np.float32)
m = torch.tensor(np.asarray(mat['mask'], np.float32).reshape(-1, 1))
eigvals = torch.tensor(np.load('/root/repo/data/2dgrid/eigenvalues.npy').astype(np.float32))
eigvecs = torch.tensor(np.load('/root/repo/data/2dgrid/eigenvectors.npy').astype(np.float32))
y = torch.tensor(np.load('/root/repo/data/2dgrid/y_band.npy').astype(np.float32))

class EqDS(nn.Module):
    def __init__(s, dims, bn):
        super().__init__()
        s.l1 = nn.ModuleList(nn.Linear(a, b) for a, b in dims)
        s.l2 = nn.ModuleList(nn.Linear(a, b) for a, b in dims)
        s.bns = nn.ModuleList(
            nn.BatchNorm1d(b, track_running_stats=False)
            for a, b in dims[:-1]) if bn else None
    def forward(s, x):
        for i in range(len(s.l1) - 1):
            x = F.relu(s.l1[i](x) + s.l2[i](x.mean(-2, keepdim=True)))
            if s.bns is not None:
                if x.ndim == 2: x = s.bns[i](x)
                else: x = s.bns[i](x.transpose(2, 1)).transpose(2, 1)
        return s.l1[-1](x) + s.l2[-1](x.mean(-2, keepdim=True))

phi = EqDS([(1, 32), (32, 32), (32, 1)], bn=True)
rho = EqDS([(2048, 10), (10, 10), (10, 32)], bn=True)
base = EqDS([(33, 32), (32, 32), (32, 1)], bn=False)

def load(mod, prefix):
    sd = {}
    for i in range(len(mod.l1)):
        sd[f"l1.{i}.weight"] = torch.tensor(npz[f"{prefix}/lin1_{i}/kernel"].T.copy())
        sd[f"l1.{i}.bias"] = torch.tensor(npz[f"{prefix}/lin1_{i}/bias"])
        sd[f"l2.{i}.weight"] = torch.tensor(npz[f"{prefix}/lin2_{i}/kernel"].T.copy())
        sd[f"l2.{i}.bias"] = torch.tensor(npz[f"{prefix}/lin2_{i}/bias"])
    if mod.bns is not None:
        for i in range(len(mod.l1) - 1):
            sd[f"bns.{i}.weight"] = torch.tensor(npz[f"{prefix}/bn_{i}/scale"])
            sd[f"bns.{i}.bias"] = torch.tensor(npz[f"{prefix}/bn_{i}/bias"])
    mod.load_state_dict(sd)

load(phi, 'pe/phi'); load(rho, 'pe/rho'); load(base, 'base/ds')
params = list(phi.parameters()) + list(rho.parameters()) + list(base.parameters())
opt = torch.optim.Adam(params, lr=0.01)

x = torch.tensor(x_all[:, img:img+1])
yt = y[:, img:img+1]
lam = eigvals.unsqueeze(0).repeat(n, 1)
v = eigvecs.T.unsqueeze(-1)          # k x n x 1
losses = []
for ep in range(epochs):
    opt.zero_grad()
    feats = phi(v) + phi(-v)                       # k x n x 1
    feats = feats.transpose(1, 0).reshape(n, -1)   # n x k
    feats = torch.cat([feats, lam], -1)            # n x 2k
    pe = rho(feats)                                # n x 32
    pred = base(torch.cat([x, pe], -1))            # n x 1
    loss = (m * (pred - yt)).square().sum()
    loss.backward(); opt.step()
    losses.append(loss.item())
    if ep % 10 == 0 or ep == epochs - 1:
        print(f"torch ep {ep}: {loss.item():.6f}", flush=True)
print("min:", min(losses))
