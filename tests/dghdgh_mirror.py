"""Torch mirrors of the ccmh DGHDGH reconstruction, injected as the
reference's MISSING modules so the real DGHDGHTrainer loop can run.

train/DGHDGH/loss.py:10-12 imports ``.gnn`` (GNNDecoder),
``.graph_generator`` (GraphGenerator) and ``utils.utils.gen_triplets``,
none of which exist in the snapshot (SURVEY §2.5, docs/
dghdgh_reconstruction.md).  These classes mirror ccmh/losses/dghdgh.py's
reconstruction exactly (same architecture, same float ops) so that the
surviving reference code — PaperLoss.fwd_stage1/fwd_stage2/triplet_loss,
GeneralPulling, the three-optimizer train_epoch — drives the identical
model on the torch side of the whole-loop parity test.

Triplets: the reconstruction samples a fixed-shape triplet budget
(T_PER_ANCHOR per anchor); for cross-framework alignment both sides pin
the draw to the same deterministic cyclic rule (``det_triplets`` here,
``det_gen_triplets_jnp`` for the jax side) — the t-th triplet of anchor i
uses its (t mod count)-th eligible positive/negative in index order.
Anchors with no eligible positive or negative are dropped (torch, ragged)
/ masked (jax, fixed-shape) — identical masked means.
"""

import numpy as np
import torch
from torch import nn
from torch.nn import functional as F

import jax.numpy as jnp

from ccmh.losses.dghdgh import T_PER_ANCHOR

_BIG = 1e30


# ------------------------------------------------------------ triplet rule
def det_triplets(labels: np.ndarray, cross: bool, t: int = T_PER_ANCHOR):
    """(anchors, pos, neg, valid) [B, t] under the deterministic cyclic
    rule; the same-set case excludes the diagonal (loss.py:108-109)."""
    b = labels.shape[0]
    same = (labels @ labels.T) > 0
    pos_allowed = same.copy()
    if not cross:
        np.fill_diagonal(pos_allowed, False)
    neg_allowed = ~same

    def pick(allowed):
        order = np.argsort(~allowed, axis=1, kind="stable")
        cnt = allowed.sum(1)
        ts = np.arange(t)[None, :]
        return order[np.arange(b)[:, None],
                     ts % np.maximum(cnt, 1)[:, None]], cnt

    pos, cp = pick(pos_allowed)
    neg, cn = pick(neg_allowed)
    anchors = np.broadcast_to(np.arange(b)[:, None], (b, t))
    valid = np.broadcast_to(((cp > 0) & (cn > 0))[:, None], (b, t))
    return anchors, pos, neg, valid


def gen_triplets(labels, ref_labels=None):
    """Reference-side signature (loss.py:108-109): ``gen_triplets(labels)``
    same-set / ``gen_triplets(labels, labels)`` cross.  Returns ragged
    (anc, pos, neg) long tensors with invalid anchors dropped."""
    lab = labels.detach().cpu().numpy()
    a, p, n, valid = det_triplets(lab, cross=ref_labels is not None)
    keep = valid.ravel()
    dev = labels.device
    return (torch.as_tensor(a.ravel()[keep], device=dev),
            torch.as_tensor(p.ravel()[keep], device=dev),
            torch.as_tensor(n.ravel()[keep], device=dev))


def det_gen_triplets_jnp(rng, labels, cross: bool = False):
    """Drop-in for ccmh.losses.dghdgh.gen_triplets pinned to the same
    deterministic rule (rng ignored)."""
    b = labels.shape[0]
    same = (labels @ labels.T) > 0
    pos_allowed = same if cross else (same & ~jnp.eye(b, dtype=bool))
    neg_allowed = ~same

    def pick(allowed):
        order = jnp.argsort(~allowed, axis=1, stable=True)
        cnt = jnp.sum(allowed, 1)
        ts = jnp.arange(T_PER_ANCHOR)[None, :]
        return order[jnp.arange(b)[:, None],
                     ts % jnp.maximum(cnt, 1)[:, None]], cnt

    pos, cp = pick(pos_allowed)
    neg, cn = pick(neg_allowed)
    anchors = jnp.broadcast_to(jnp.arange(b)[:, None], (b, T_PER_ANCHOR))
    valid = jnp.broadcast_to(((cp > 0) & (cn > 0))[:, None], (b, T_PER_ANCHOR))
    return anchors.ravel(), pos.ravel(), neg.ravel(), valid.ravel()


# ------------------------------------------------------------- GNN mirrors
class GraphGenerator(nn.Module):
    """Fully-connected batch graph (loss.py:35-36 pins B² edges, row-major
    anchor-first: edge_reprs.reshape(B, B, K)[anc, neg]).  Edge features
    [z_i ⊙ r_j, |z_i − r_j|]; node_attrs carries (z, ref) stacked."""

    def get_graph(self, z, ref=None):
        if ref is None:
            ref = z
        b = z.shape[0]
        prod = z.unsqueeze(1) * ref.unsqueeze(0)            # [B, B, K]
        diff = (z.unsqueeze(1) - ref.unsqueeze(0)).abs()
        edge_attrs = torch.cat([prod, diff], -1).reshape(b * b, -1)
        ii = torch.arange(b, device=z.device)
        edge_idxes = torch.stack(
            [ii.repeat_interleave(b), ii.repeat(b)], dim=1)  # [B*B, 2]
        node_attrs = torch.stack([z, ref])                   # [2, B, K]
        return edge_attrs, edge_idxes, node_attrs


class GNNDecoder(nn.Module):
    """Mirror of ccmh gnn_forward (ccmh/losses/dghdgh.py:85-114): n_layers
    rounds of [edge MLP -> sigmoid gate, per-head attention-weighted mean
    message, tanh node update], per-node class logits, last layer's gate as
    the λij edge representation GeneralPulling consumes."""

    def __init__(self, embed_dim, out_dim, reduce=1, n_layers=2, n_heads=4,
                 n_classes=24):
        super().__init__()
        k = embed_dim
        hidden = 2 * k
        self.n_heads = n_heads
        self.layers = nn.ModuleList()
        for _ in range(n_layers):
            self.layers.append(nn.ModuleDict({
                "fc1": nn.Linear(2 * k, hidden),
                "fc2": nn.Linear(hidden, k),
                "attn": nn.Linear(2 * k, n_heads),
                "node": nn.Linear(2 * k, k),
            }))
        self.classifier = nn.Linear(k, n_classes)

    def forward(self, node_attrs, edge_idxes, edge_attrs, labels=None):
        z, ref = node_attrs[0], node_attrs[1]
        b, k = z.shape
        h_heads = self.n_heads
        cur = z
        edge = None
        for layer in self.layers:
            prod = cur.unsqueeze(1) * ref.unsqueeze(0)
            diff = (cur.unsqueeze(1) - ref.unsqueeze(0)).abs()
            edge_in = torch.cat([prod, diff], -1)           # [B, B, 2K]
            h = F.relu(layer["fc1"](edge_in))
            edge = torch.sigmoid(layer["fc2"](h))           # [B, B, K]
            logits = layer["attn"](edge_in)                 # [B, B, H]
            w = torch.softmax(logits, dim=1)
            values = edge * ref.unsqueeze(0)
            vh = values.reshape(b, b, h_heads, k // h_heads)
            msg = torch.einsum("bnh,bnhd->bhd", w, vh).reshape(b, k)
            cur = torch.tanh(layer["node"](torch.cat([cur, msg], -1)))
        preds = self.classifier(cur)
        return cur, preds, edge.reshape(b * b, k)


# ----------------------------------------------------- missing-dep shims
def scatter_mean(src, index, dim=0):
    """Faithful torch_scatter.scatter_mean for the 2-D dim=0 case the
    reference uses (loss.py:235)."""
    n = int(index.max()) + 1
    out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
    out.index_add_(0, index, src)
    counts = torch.bincount(index, minlength=n).clamp(min=1)
    return out / counts.view(-1, *([1] * (src.dim() - 1))).to(src.dtype)


class AverageMeter:
    """timm.utils.AverageMeter (hash_train.py:7,69-75)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


# --------------------------------------------------- parameter conversion
def _conv_lin(mod):
    import jax.numpy as _jnp

    return {"w": _jnp.asarray(mod.weight.detach().numpy().T),
            "b": _jnp.asarray(mod.bias.detach().numpy())}


def conv_gnn(gnn: GNNDecoder):
    """Torch GNNDecoder -> ccmh init_gnn param tree."""
    layers = []
    for layer in gnn.layers:
        layers.append({
            "edge_mlp": {"fc1": _conv_lin(layer["fc1"]),
                         "fc2": _conv_lin(layer["fc2"])},
            "attn": _conv_lin(layer["attn"]),
            "node_mlp": _conv_lin(layer["node"]),
        })
    return {"layers": layers, "classifier": _conv_lin(gnn.classifier)}


def conv_classifier(lin: nn.Linear):
    return _conv_lin(lin)
