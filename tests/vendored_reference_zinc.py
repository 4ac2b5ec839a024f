"""VENDORED REFERENCE CODE — parity oracle, not part of the framework.

This file transcribes the reference's `NestedGIN_eff` ZINC model
(`/root/reference/zinc_models.py:504-611`) as directly as possible, per
the round-1 verdict's hardening request: the rest of the parity suite
re-derives the torch math independently (tests/torch_ref.py), which
leaves a common-mode-error risk — the same misreading on both sides
would pass. This copy keeps the reference's structure and forward
line-for-line so at least one test's torch side is reference-lifted.

Two PyG symbols are replaced with plain-torch equivalents (PyG is not
installed in this environment):
  * `GINEConv` -> `_PlainGINEConv` below, implementing PyG's documented
    semantics exactly: out = nn((1 + eps) * x + sum_{j->i}
    ReLU(x_j + lin(e_ji))) with `lin` present because edge_dim differs
    from in_channels (torch_geometric/nn/conv/gin_conv.py).
  * `global_add_pool` -> `_global_add_pool` (index_add over the segment
    ids — the documented scatter-add semantics).

Everything else (layer list, Sequential composition, hardcoded
hidden=256, z_in=1800, the `hasattr(data, 'edge_pos')` dense fallback,
the `x.size()[0] > 1` BN guard) follows the reference verbatim.
"""

import torch
import torch.nn.functional as F
from torch.nn import BatchNorm1d as BN
from torch.nn import Dropout, ELU, Linear, Sequential


def _global_add_pool(x, batch):
    num_segments = int(batch.max().item()) + 1 if batch.numel() else 0
    out = torch.zeros(
        (num_segments,) + x.shape[1:], dtype=x.dtype, device=x.device
    )
    return out.index_add_(0, batch, x)


class _PlainGINEConv(torch.nn.Module):
    """PyG GINEConv(train_eps=True, edge_dim=...) without PyG."""

    def __init__(self, nn_module, train_eps=True, edge_dim=None):
        super().__init__()
        self.nn = nn_module
        self.initial_eps = 0.0
        if train_eps:
            self.eps = torch.nn.Parameter(torch.empty(1))
        else:
            self.register_buffer("eps", torch.empty(1))
        self.eps.data.fill_(self.initial_eps)
        # PyG: self.lin = Linear(edge_dim, in_channels) when edge_dim is
        # set; in_channels inferred from the first Linear of `nn`
        in_channels = None
        for m in nn_module:
            if isinstance(m, Linear):
                in_channels = m.in_features
                break
        self.lin = Linear(edge_dim, in_channels)

    def forward(self, x, edge_index, edge_attr):
        src, dst = edge_index[0], edge_index[1]
        msg = F.relu(x[src] + self.lin(edge_attr))
        agg = torch.zeros_like(x).index_add_(0, dst, msg)
        return self.nn((1 + self.eps) * x + agg)


GINEConv = _PlainGINEConv
global_add_pool = _global_add_pool


class NestedGIN_eff(torch.nn.Module):
    def __init__(self, dataset, num_layers, concat=False, use_pos=False,
                 use_max_dist=False, RNI=False, **kwargs):
        super(NestedGIN_eff, self).__init__()
        self.use_z = True
        hidden = 256
        dropout = 0.0
        self.dropout = dropout
        z_in = 1800  # if self.use_rd else 1700
        self.z_initial = torch.nn.Embedding(z_in, hidden)
        self.z_embedding = Sequential(Dropout(dropout),
                                      BN(hidden),
                                      ELU(),
                                      Linear(hidden, hidden),
                                      Dropout(dropout),
                                      BN(hidden),
                                      ELU()
                                      )
        input_dim = 32  # dataset.num_features

        edge_attr_dim = 32
        self.conv1 = GINEConv(
            Sequential(
                Linear(input_dim, hidden),
                Dropout(dropout),
                BN(hidden),
                ELU(),
                Linear(hidden, hidden),
                Dropout(dropout),
                BN(hidden),
                ELU()
            ),
            train_eps=True,
            edge_dim=hidden + edge_attr_dim)
        self.convs = torch.nn.ModuleList()
        for i in range(num_layers - 1):
            self.convs.append(GINEConv(
                Sequential(
                    Linear(hidden, hidden),
                    Dropout(dropout),
                    BN(hidden),
                    ELU(),
                    Linear(hidden, hidden),
                    Dropout(dropout),
                    BN(hidden),
                    ELU()
                ),
                train_eps=True,
                edge_dim=hidden + edge_attr_dim))

        self.lin1 = torch.nn.Linear(num_layers * hidden, hidden)
        self.bn_lin1 = torch.nn.BatchNorm1d(hidden, eps=1e-5, momentum=0.1)
        self.lin2 = Linear(hidden, 1)
        self.node_type_embedding = torch.nn.Embedding(100, 32)
        self.edge_type_embedding = torch.nn.Embedding(100, 32)

    def forward(self, data):
        x, edge_index, batch = (
            self.node_type_embedding(data.x), data.edge_index, data.batch
        )

        if hasattr(data, 'edge_pos'):
            # original, slow version
            edge_pos = data.edge_pos.float()
            z_emb = torch.mm(edge_pos, self.z_initial.weight)
        else:
            # new, fast version
            z_emb = global_add_pool(
                torch.mul(self.z_initial.weight[data.pos_index],
                          data.pos_enc.view(-1, 1)), data.pos_batch)
        z_emb = self.z_embedding(z_emb)
        z_emb = torch.cat(
            (z_emb, self.edge_type_embedding(data.edge_attr)), dim=-1)

        x = self.conv1(x, edge_index, z_emb)

        xs = [x]
        for conv in self.convs:
            x = conv(x, edge_index, z_emb)
            xs += [x]

        x = global_add_pool(torch.cat(xs, dim=1), batch)
        x = self.lin1(x)
        if x.size()[0] > 1:
            x = self.bn_lin1(x)
        x = F.dropout(x, p=self.dropout, training=self.training)
        x = F.elu(x)
        x = self.lin2(x)

        return x
