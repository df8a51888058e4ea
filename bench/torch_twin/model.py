"""PyTorch twin of the reference MolecularVAE (parity + baseline measurement).

Role (SURVEY.md sections 4.2, 6, 7 stage 3): the reference mount was empty at
build time, so this twin *is* the local stand-in for the PyTorch reference:
 1. golden parity tests load identical weights into this twin and the molvax
    model and require fp32-tolerance agreement (tests/parity/);
 2. the throughput denominator for the >=10x target (BASELINE.json:5) is
    measured on this twin on CPU (bench/throughput.py).

It implements BOTH lineage variants behind the same flags as molvax
(SURVEY.md notes A/B): conv orientation 'seq'|'charset', decoder conditioning
'teacher_forced'|'repeat_z', recon loss 'ce'|'bce', eps scale. Module names
(conv_1.., linear_0..4, gru) follow the reference layout so a real reference
state_dict drops in unchanged via molvax.io.torch_compat.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class MolecularVAETwin(nn.Module):
    def __init__(
        self,
        max_len: int = 120,
        charset_size: int = 37,
        latent_dim: int = 292,
        conv_channels=(9, 9, 10),
        conv_kernels=(9, 9, 11),
        conv_orientation: str = "seq",
        enc_hidden: int = 435,
        gru_hidden: int = 501,
        gru_layers: int = 3,
        decoder_conditioning: str = "teacher_forced",
        recon_loss: str = "ce",
        eps_scale: float = 1.0,
        n_properties: int = 0,
        property_hidden: int = 67,
    ):
        super().__init__()
        self.max_len = max_len
        self.charset_size = charset_size
        self.latent_dim = latent_dim
        self.conv_orientation = conv_orientation
        self.decoder_conditioning = decoder_conditioning
        self.recon_loss = recon_loss
        self.eps_scale = eps_scale
        self.n_properties = n_properties

        in_ch = charset_size if conv_orientation == "seq" else max_len
        spatial = max_len if conv_orientation == "seq" else charset_size
        convs = []
        for i, (out_ch, k) in enumerate(zip(conv_channels, conv_kernels), start=1):
            convs.append((f"conv_{i}", nn.Conv1d(in_ch, out_ch, kernel_size=k)))
            in_ch = out_ch
            spatial = spatial - k + 1
        for name, mod in convs:
            setattr(self, name, mod)
        self.n_convs = len(convs)
        flat = conv_channels[-1] * spatial

        self.linear_0 = nn.Linear(flat, enc_hidden)
        self.linear_1 = nn.Linear(enc_hidden, latent_dim)  # mu
        self.linear_2 = nn.Linear(enc_hidden, latent_dim)  # logvar
        self.linear_3 = nn.Linear(latent_dim, latent_dim)
        gru_in = (
            latent_dim + charset_size
            if decoder_conditioning == "teacher_forced"
            else latent_dim
        )
        self.gru = nn.GRU(gru_in, gru_hidden, gru_layers, batch_first=True)
        self.linear_4 = nn.Linear(gru_hidden, charset_size)
        if n_properties > 0:
            self.prop_hidden = nn.Linear(latent_dim, property_hidden)
            self.prop_out = nn.Linear(property_hidden, n_properties)

    # -- reference API surface (SURVEY.md L2) ------------------------------
    def encode(self, x):
        """x: (B, T, C) one-hot float."""
        h = x.transpose(1, 2) if self.conv_orientation == "seq" else x
        for i in range(1, self.n_convs + 1):
            h = F.relu(getattr(self, f"conv_{i}")(h))
        h = h.reshape(h.size(0), -1)
        h = F.selu(self.linear_0(h))
        return self.linear_1(h), self.linear_2(h)

    def sampling(self, mu, logvar):
        eps = self.eps_scale * torch.randn_like(logvar)
        return mu + torch.exp(0.5 * logvar) * eps

    def decode(self, z, teacher_onehot=None):
        """Returns per-step logits (B, T, C)."""
        z_emb = F.selu(self.linear_3(z))
        B = z.size(0)
        if self.decoder_conditioning == "teacher_forced":
            assert teacher_onehot is not None
            shifted = torch.cat(
                [
                    torch.zeros(B, 1, self.charset_size, dtype=teacher_onehot.dtype),
                    teacher_onehot[:, :-1, :],
                ],
                dim=1,
            )
            z_tiled = z_emb.unsqueeze(1).expand(B, self.max_len, z_emb.size(-1))
            seq = torch.cat([z_tiled, shifted], dim=-1)
        else:
            seq = z_emb.unsqueeze(1).repeat(1, self.max_len, 1)
        out, _ = self.gru(seq)
        return self.linear_4(out)

    def predict_properties(self, z):
        return self.prop_out(torch.tanh(self.prop_hidden(z)))

    def forward(self, x_onehot, noise=True):
        mu, logvar = self.encode(x_onehot)
        z = self.sampling(mu, logvar) if noise else mu
        teacher = x_onehot if self.decoder_conditioning == "teacher_forced" else None
        logits = self.decode(z, teacher)
        props = self.predict_properties(z) if self.n_properties > 0 else None
        return logits, mu, logvar, z, props


def vae_loss_twin(model, logits, codes, mu, logvar, beta=1.0):
    """Reference-style ELBO, same reduction as molvax (per-sample sums,
    batch mean). codes: (B, T) int64."""
    if model.recon_loss == "ce":
        recon = F.cross_entropy(
            logits.reshape(-1, logits.size(-1)), codes.reshape(-1), reduction="none"
        ).reshape(codes.shape).sum(dim=-1)
    else:
        probs = torch.softmax(logits, dim=-1)
        onehot = F.one_hot(codes, model.charset_size).float()
        recon = F.binary_cross_entropy(probs, onehot, reduction="none").sum(dim=(-1, -2))
    kl = -0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp(), dim=-1)
    return (recon + beta * kl).mean(), recon, kl
