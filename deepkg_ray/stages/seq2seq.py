"""CPU-scale seq2struct model tier: a real autoregressive encoder-decoder
(pure numpy) behind the same tokenizer/generate contract the reference's T5
tier uses (UIE_torch/run_seq2struct_torch.py:115-137: tokenizer(batch) →
model.generate(max_length) → batch_decode → SEL2Record), so the engine's
generator actor pool is exercised by an actual neural generate loop — not
only by the deterministic template stand-in.

The weights are seeded-random (untrained), exactly the "random-weight tiny
model" tier: output SEL strings are structurally arbitrary, which is what
parse_sel's bracket-repair path exists for (the reference feeds it
early-training checkpoints that emit equally malformed SEL).  Swapping in a
trained torch T5 means replacing TinySeq2Seq with the torch module — the
tokenizer contract, actor signature, and downstream parse are unchanged
(pipelines/uie.py:NumpySeq2SEL vs TorchSeq2SEL).
"""

from __future__ import annotations

import numpy as np

# T5 special-token contract (reference UIE_torch/t5tokenizer.py:27-133):
# pad is the decoder start token, </s> the EOS, <extra_id_0>/<extra_id_1>
# the SEL structure markers added as special vocabulary.
PAD, EOS, UNK = "<pad>", "</s>", "<unk>"
EXTRA0, EXTRA1 = "<extra_id_0>", "<extra_id_1>"
SPECIALS = [PAD, EOS, UNK, EXTRA0, EXTRA1]


class SELTokenizer:
    """Whitespace word-level tokenizer with the T5 special-token layout.

    encode: specials are matched as whole tokens; other whitespace tokens
    map through the vocab (OOV → <unk>); truncation to max_len with EOS
    always terminating the sequence.  decode: stops at EOS, skips PAD,
    joins with single spaces — the skip_special_tokens=False behaviour the
    reference relies on to keep <extra_id_*> markers in the decoded string
    (run_seq2struct_torch.py:132-137)."""

    def __init__(self, words: list[str]):
        vocab = list(SPECIALS)
        seen = set(vocab)
        for w in words:
            for tok in str(w).split():
                if tok not in seen:
                    seen.add(tok)
                    vocab.append(tok)
        self.vocab = vocab
        self.ids = {w: i for i, w in enumerate(vocab)}
        self.pad_id = self.ids[PAD]
        self.eos_id = self.ids[EOS]
        self.unk_id = self.ids[UNK]

    def __len__(self) -> int:
        return len(self.vocab)

    def encode(self, text: str, max_len: int = 64) -> list[int]:
        out = [self.ids.get(t, self.unk_id) for t in text.split()]
        out = out[: max_len - 1]
        out.append(self.eos_id)
        return out

    def encode_batch(self, texts: list[str], max_len: int = 64) -> np.ndarray:
        """Right-padded id matrix [B, L] (pad_id) — the tokenizer(padding=
        True) shape the model consumes."""
        enc = [self.encode(t, max_len) for t in texts]
        L = max(len(e) for e in enc) if enc else 1
        out = np.full((len(enc), L), self.pad_id, dtype=np.int64)
        for i, e in enumerate(enc):
            out[i, : len(e)] = e
        return out

    def decode(self, ids) -> str:
        toks = []
        for i in ids:
            if i == self.eos_id:
                break
            if i == self.pad_id:
                continue
            toks.append(self.vocab[int(i)])
        return " ".join(toks)


class TinySeq2Seq:
    """Tied-embedding encoder-decoder with one attention-free recurrence —
    the smallest module that still has the generate() semantics of the
    reference tier (autoregressive greedy decode from the pad start token,
    stop on EOS / max_length).

    encoder:  ctx = tanh(mean_t E[x_t] · W_enc)            [B, d]
    decoder:  h_t = tanh(E[y_{t-1}] · W_dec + ctx · U + b) [B, d]
    logits_t = h_t · Eᵀ  (weight tying)                    [B, V]

    All steps are batch-vectorized numpy matmuls; weights are drawn from a
    seeded RNG so the generator is deterministic across actors/retries."""

    def __init__(self, vocab_size: int, d_model: int = 48, seed: int = 11,
                 pad_id: int = 0, eos_id: int = 1):
        rng = np.random.default_rng(seed)
        s = 1.0 / np.sqrt(d_model)
        self.E = rng.standard_normal((vocab_size, d_model)) * s
        self.W_enc = rng.standard_normal((d_model, d_model)) * s
        self.W_dec = rng.standard_normal((d_model, d_model)) * s
        self.U = rng.standard_normal((d_model, d_model)) * s
        self.b = rng.standard_normal(d_model) * s
        self.pad_id, self.eos_id = pad_id, eos_id

    def generate(self, input_ids: np.ndarray, max_length: int = 48) -> np.ndarray:
        """Greedy batch decode → id matrix [B, max_length] (pad-filled after
        each row's EOS)."""
        B = input_ids.shape[0]
        mask = (input_ids != self.pad_id).astype(np.float64)[:, :, None]
        emb = self.E[input_ids] * mask
        denom = np.maximum(mask.sum(axis=1), 1.0)
        ctx = np.tanh((emb.sum(axis=1) / denom) @ self.W_enc)       # [B, d]
        ctx_u = ctx @ self.U
        prev = np.full(B, self.pad_id, dtype=np.int64)              # decoder start
        done = np.zeros(B, dtype=bool)
        out = np.full((B, max_length), self.pad_id, dtype=np.int64)
        for t in range(max_length):
            h = np.tanh(self.E[prev] @ self.W_dec + ctx_u + self.b)
            logits = h @ self.E.T                                   # [B, V]
            nxt = np.argmax(logits, axis=1)
            nxt = np.where(done, self.pad_id, nxt)
            out[:, t] = nxt
            done |= nxt == self.eos_id
            if done.all():
                break
            prev = nxt
        return out
