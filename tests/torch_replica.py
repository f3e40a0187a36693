"""Scale-parametrized torch replica of the reference TemporalAligner.

Key space and forward semantics match reference model/tan_model.py:13-149 +
model/tfm_model.py:17-55 + model/word2vec_model.py:76-102 (written from the
SURVEY description, not copied).  It exists to prove the torch->flax converter
and the flax forward reproduce torch ``nn.MultiheadAttention`` semantics — at
tiny scale in test_checkpoint.py and at the released E6D6 scale in
test_dress_rehearsal.py.
"""

import collections

import torch
import torch.nn as nn


class TorchBlock(nn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
        self.ln_1 = nn.LayerNorm(width)
        self.mlp = nn.Sequential(
            collections.OrderedDict(
                [
                    ("c_fc", nn.Linear(width, width * 4)),
                    ("gelu", nn.Identity()),  # replaced by QuickGELU in forward
                    ("c_proj", nn.Linear(width * 4, width)),
                ]
            )
        )
        self.ln_2 = nn.LayerNorm(width)

    def forward(self, x, key_padding_mask=None):
        x_norm = self.ln_1(x)
        a, _ = self.attn(
            x_norm, x_norm, x_norm, key_padding_mask=key_padding_mask, need_weights=False
        )
        x = x + a
        h = self.mlp.c_fc(self.ln_2(x))
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        return x + self.mlp.c_proj(h), x_norm


class TorchEncoder(nn.Module):
    def __init__(self, width, heads, layers):
        super().__init__()
        self.resblocks = nn.ModuleList(TorchBlock(width, heads) for _ in range(layers))

    def forward(self, x, key_padding_mask=None):
        # per-layer taps: pre-norm activations of layers 2..L plus final output
        # (reference tfm_model.py:48-55)
        taps = []
        for blk in self.resblocks:
            x, x_norm = blk(x, key_padding_mask)
            taps.append(x_norm)
        taps.pop(0)
        taps.append(x)
        return taps


class TorchWord2Vec(nn.Module):
    def __init__(self, vocab_words, word_dim=300, hidden_dim=2048, output_dim=512):
        super().__init__()
        self.word_embd = nn.Embedding(vocab_words + 1, word_dim)
        self.fc1 = nn.Linear(word_dim, hidden_dim)
        self.fc2 = nn.Linear(hidden_dim, output_dim)

    def forward(self, ids, mask):
        x = torch.relu(self.fc1(self.word_embd(ids)))
        keep = mask.bool()
        keep = keep | ~keep.any(-1, keepdim=True)
        x = x.masked_fill(~keep.unsqueeze(-1), -6.0e4)
        return self.fc2(x.max(dim=-2).values)


class TorchTAN(nn.Module):
    """Key space identical to reference TemporalAligner (tan_model.py:38-72)."""

    def __init__(
        self,
        width=512,
        heads=8,
        enc_layers=6,
        joint_layers=6,
        vdim=1024,
        vocab_words=66250,
        num_pos=1024,
        text_dim=512,
        text_encoder=None,
    ):
        """``text_encoder``: pass a real HF ``BertModel`` for the reference's
        language_model='bert' variant (tan_model.py:37-40) — the attribute is
        still named ``bert`` so the state_dict carries the genuine
        ``bert.embeddings/encoder/pooler.*`` key space the converter maps;
        its pooler_output is the sentence embedding (text_dim must equal its
        hidden_size, 768 for the reference recipe)."""
        super().__init__()
        self.bert = (
            text_encoder
            if text_encoder is not None
            else TorchWord2Vec(vocab_words, output_dim=text_dim)
        )
        self.video_temporal_encoder = TorchEncoder(width, heads, enc_layers)
        self.joint_temporal_encoder = TorchEncoder(width, heads, joint_layers)
        self.video_pre_proj = nn.Linear(vdim, width, bias=False)
        self.text_pre_proj = nn.Linear(text_dim, width, bias=False)
        self.ln_text_init = nn.LayerNorm(width)
        self.ln_video_init = nn.LayerNorm(width)
        self.ln_position_init = nn.LayerNorm(width)
        self.ln_video_post_enc = nn.LayerNorm(width)
        self.ln_joint_post_enc = nn.LayerNorm(width)
        self.temporal_pos_embed = nn.Parameter(torch.randn(num_pos, width) * 0.01)
        self.text_temporal_pos_embed = nn.Parameter(torch.randn(num_pos, width) * 0.01)
        self.mlp = nn.Linear(width, width)  # unused, as in the reference
        self.binary_head = nn.Linear(width, 1)

    def _encode_text(self, ids, tok_mask):
        if isinstance(self.bert, TorchWord2Vec):
            return self.bert(ids, tok_mask)
        # HF BertModel: pooled [CLS] embedding, matching
        # TANWithText.encode_text's pooler_output read (flattened to the
        # 2-D [B*N, W] batch BertModel expects, like encode_text does)
        lead = ids.shape[:-1]
        flat_ids = ids.reshape(-1, ids.shape[-1])
        pooled = self.bert(
            input_ids=flat_ids,
            attention_mask=tok_mask.reshape(-1, ids.shape[-1]),
            token_type_ids=torch.zeros_like(flat_ids),
        ).pooler_output
        return pooled.reshape(*lead, -1)

    def forward(self, video, ids, tok_mask, lang_padding_mask):
        nrm = lambda x: x / x.norm(dim=-1, keepdim=True)
        text = self.ln_text_init(self.text_pre_proj(self._encode_text(ids, tok_mask)))

        v = self.ln_video_init(self.video_pre_proj(video))
        v = v + self.ln_position_init(self.temporal_pos_embed[: v.shape[1]])
        dual = torch.stack(self.video_temporal_encoder(v), dim=1)  # [B,S,T,C]
        dual = torch.cat(
            [dual[:, :-1], self.ln_video_post_enc(dual[:, -1:])], dim=1
        )
        logits_dual = torch.einsum("astc,bkc->astbk", nrm(dual), nrm(text))

        joint_in = torch.cat([v, text], dim=1)
        pad = torch.cat(
            [torch.zeros(video.shape[0], v.shape[1], dtype=torch.bool), lang_padding_mask],
            dim=1,
        )
        joint = torch.stack(self.joint_temporal_encoder(joint_in, pad), dim=1)
        joint = torch.cat(
            [joint[:, :-1], self.ln_joint_post_enc(joint[:, -1:])], dim=1
        )
        jv, jt = joint[:, :, : v.shape[1]], joint[:, :, v.shape[1] :]
        logits_joint = torch.einsum("astc,bskc->astbk", nrm(jv), nrm(jt))
        return logits_dual, logits_joint, self.binary_head(jt)
