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
                 pad_id: int = 0, eos_id: int = 1, order2: bool = False):
        rng = np.random.default_rng(seed)
        s = 1.0 / np.sqrt(d_model)
        self.E = rng.standard_normal((vocab_size, d_model)) * s
        self.W_enc = rng.standard_normal((d_model, d_model)) * s
        self.W_dec = rng.standard_normal((d_model, d_model)) * s
        self.U = rng.standard_normal((d_model, d_model)) * s
        self.b = rng.standard_normal(d_model) * s
        # optional second-order conditioning on y_{t-2} (drawn AFTER the
        # base weights so order2=False reproduces the original seeded tier
        # bit-for-bit); still recurrence-free → teacher forcing stays one
        # batched matmul over all positions
        self.order2 = order2
        self.W_dec2 = (rng.standard_normal((d_model, d_model)) * s
                       if order2 else None)
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
        prev2 = np.full(B, self.pad_id, dtype=np.int64)
        done = np.zeros(B, dtype=bool)
        out = np.full((B, max_length), self.pad_id, dtype=np.int64)
        for t in range(max_length):
            pre = self.E[prev] @ self.W_dec + ctx_u + self.b
            if self.order2:
                pre = pre + self.E[prev2] @ self.W_dec2
            h = np.tanh(pre)
            logits = h @ self.E.T                                   # [B, V]
            nxt = np.argmax(logits, axis=1)
            nxt = np.where(done, self.pad_id, nxt)
            out[:, t] = nxt
            done |= nxt == self.eos_id
            if done.all():
                break
            prev2 = prev
            prev = nxt
        return out


def train_tiny_seq2seq(model: "TinySeq2Seq", tok: "SELTokenizer",
                       pairs: list[tuple[str, str]], *, epochs: int = 30,
                       batch_size: int = 256, lr: float = 3e-3,
                       enc_len: int = 64, dec_len: int = 48,
                       seed: int = 20260818, callbacks=None) -> dict:
    """Teacher-forced cross-entropy training of TinySeq2Seq on
    (source text, target SEL) pairs — the tiny-checkpoint analog of the
    reference's seq2struct fine-tune (UIE_torch/run_seq2struct_torch.py's
    Trainer loop), entirely in numpy.

    The decoder has no recurrent state (h_t depends only on y_{t-1} and
    the encoder context), so teacher forcing is ONE batched matmul over
    all (batch, time) positions per step — training a corpus of a few
    thousand pairs takes seconds on CPU.  Adam, seeded shuffling,
    deterministic.  Returns {'losses': [...], 'n_steps': int}; weights
    update in place (the model object IS the checkpoint — pickle it per
    the actor-constructor-artifact convention)."""
    rng = np.random.default_rng(seed)
    X = tok.encode_batch([s for s, _ in pairs], max_len=enc_len)
    Yfull = tok.encode_batch([t for _, t in pairs], max_len=dec_len)
    pad, _eos = model.pad_id, model.eos_id
    # decoder inputs: pad-start shifted targets; loss mask: up to & incl EOS
    Yin = np.concatenate([np.full((len(Yfull), 1), pad, np.int64),
                          Yfull[:, :-1]], axis=1)
    Yin2 = np.concatenate([np.full((len(Yfull), 2), pad, np.int64),
                           Yfull[:, :-2]], axis=1)
    # positions strictly after the first EOS are padding (mask them out);
    # tokenizer always terminates with EOS so every row has one
    is_eos = Yfull == model.eos_id
    eos_pos = np.argmax(is_eos, axis=1)
    Ymask = (np.arange(Yfull.shape[1])[None, :] <= eos_pos[:, None])

    params = ["E", "W_enc", "W_dec", "U", "b"]
    if model.order2:
        params.append("W_dec2")
    m_t = {p: np.zeros_like(getattr(model, p)) for p in params}
    v_t = {p: np.zeros_like(getattr(model, p)) for p in params}
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    step = 0
    losses: list[float] = []
    n = len(pairs)

    from deepkg_ray.state.callbacks import run_epochs

    def epoch_fn(epoch, state):
        nonlocal step
        order = rng.permutation(n)
        ep_loss, ep_tok = 0.0, 0
        for lo in range(0, n, batch_size):
            idx = order[lo:lo + batch_size]
            x, yin, y, ym = X[idx], Yin[idx], Yfull[idx], Ymask[idx]
            yin2 = Yin2[idx]
            B, T = y.shape
            # ---- forward ----
            xm = (x != pad).astype(np.float64)[:, :, None]
            emb = model.E[x] * xm
            denom = np.maximum(xm.sum(axis=1), 1.0)
            mvec = emb.sum(axis=1) / denom                     # [B, d]
            ctx = np.tanh(mvec @ model.W_enc)
            ctx_u = ctx @ model.U                              # [B, d]
            pre = (model.E[yin] @ model.W_dec
                   + ctx_u[:, None, :] + model.b)              # [B, T, d]
            if model.order2:
                pre = pre + model.E[yin2] @ model.W_dec2
            h = np.tanh(pre)
            logits = h @ model.E.T                             # [B, T, V]
            logits -= logits.max(axis=2, keepdims=True)
            expl = np.exp(logits)
            probs = expl / expl.sum(axis=2, keepdims=True)
            nvalid = max(int(ym.sum()), 1)
            py = np.take_along_axis(probs, y[:, :, None], 2)[:, :, 0]
            ep_loss += float(-(np.log(np.maximum(py, 1e-12)) * ym).sum())
            ep_tok += nvalid
            # ---- backward ----
            dlog = probs
            np.add.at(dlog.reshape(B * T, -1),
                      (np.arange(B * T), y.ravel()), -1.0)
            dlog *= (ym[:, :, None] / nvalid)
            flat_dlog = dlog.reshape(B * T, -1)                # [N, V]
            flat_h = h.reshape(B * T, -1)                      # [N, d]
            dE = flat_dlog.T @ flat_h                          # output proj
            dh = (dlog @ model.E) * (1.0 - h * h)              # [B, T, d]
            flat_dh = dh.reshape(B * T, -1)
            flat_yin = model.E[yin].reshape(B * T, -1)
            dW_dec = flat_yin.T @ flat_dh
            np.add.at(dE, yin.ravel(), flat_dh @ model.W_dec.T)
            if model.order2:
                flat_yin2 = model.E[yin2].reshape(B * T, -1)
                dW_dec2 = flat_yin2.T @ flat_dh
                np.add.at(dE, yin2.ravel(), flat_dh @ model.W_dec2.T)
            db = flat_dh.sum(axis=0)
            dctx_u = dh.sum(axis=1)                            # [B, d]
            dU = ctx.T @ dctx_u
            dctx = dctx_u @ model.U.T
            dmvec = (dctx * (1.0 - ctx * ctx)) @ model.W_enc.T
            dW_enc = mvec.T @ (dctx * (1.0 - ctx * ctx))
            dper_tok = (dmvec[:, None, :] / denom[:, None, :]) * xm
            np.add.at(dE, x.ravel(),
                      dper_tok.reshape(B * x.shape[1], -1))
            grads = {"E": dE, "W_enc": dW_enc, "W_dec": dW_dec,
                     "U": dU, "b": db}
            if model.order2:
                grads["W_dec2"] = dW_dec2
            step += 1
            for p in params:
                g = grads[p]
                m_t[p] = beta1 * m_t[p] + (1 - beta1) * g
                v_t[p] = beta2 * v_t[p] + (1 - beta2) * g * g
                mh = m_t[p] / (1 - beta1 ** step)
                vh = v_t[p] / (1 - beta2 ** step)
                getattr(model, p).__isub__(lr * mh / (np.sqrt(vh) + eps))
        losses.append(ep_loss / max(ep_tok, 1))
        state["loss"] = losses[-1]

    run_epochs(epochs, epoch_fn, callbacks=callbacks)
    return {"losses": losses, "n_steps": step}
