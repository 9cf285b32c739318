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
EXTRA0, EXTRA1, EXTRA5 = "<extra_id_0>", "<extra_id_1>", "<extra_id_5>"
SPECIALS = [PAD, EOS, UNK, EXTRA0, EXTRA1, EXTRA5]


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

    def encode(self, text: str, max_len: int = 64,
               drop_oov: bool = False) -> list[int]:
        if drop_oov:
            # schema-vocab tokenizer mode: out-of-vocabulary source tokens
            # are dropped instead of collapsed to <unk> — the encoder then
            # pools only schema-bearing tokens (entity words, template
            # keywords), like a tokenizer trained on the task vocabulary
            out = [i for t in text.split()
                   if (i := self.ids.get(t)) is not None]
        else:
            out = [self.ids.get(t, self.unk_id) for t in text.split()]
        out = out[: max_len - 1]
        out.append(self.eos_id)
        return out

    def encode_batch(self, texts: list[str], max_len: int = 64,
                     drop_oov: bool = False) -> np.ndarray:
        """Right-padded id matrix [B, L] (pad_id) — the tokenizer(padding=
        True) shape the model consumes."""
        enc = [self.encode(t, max_len, drop_oov) for t in texts]
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

    Opt-in capacity tiers (each drawn AFTER the base weights, so the
    all-flags-off configuration reproduces the original seeded tier
    bit-for-bit):

    - ``order2``: second-order conditioning on y_{t-2} (still
      recurrence-free, so teacher forcing remains one batched matmul).
    - ``pos_emb=N``: learned decoder position table P[N, d] added to the
      pre-activation — disambiguates SEL structure positions whose local
      (y_{t-1}, y_{t-2}) context is identical (e.g. the subject spot vs the
      trailing object spot of a same-type relation).
    - ``attn``: single-head dot-product cross-attention from each decoder
      state to the encoder token embeddings (keys get a learned encoder
      position table Penc), with the attended vector added residually
      before the tied output projection — the T5 cross-attention semantics
      (reference UIE_torch model: T5ForConditionalGeneration) at CPU scale.
      This is what makes span COPYING learnable: the bag-of-words context
      alone cannot say *which* source word to emit at each step.

    All steps are batch-vectorized numpy matmuls; weights are drawn from a
    seeded RNG so the generator is deterministic across actors/retries."""

    def __init__(self, vocab_size: int, d_model: int = 48, seed: int = 11,
                 pad_id: int = 0, eos_id: int = 1, order2: bool = False,
                 pos_emb: int = 0, attn: bool = False, enc_pos: int = 80):
        rng = np.random.default_rng(seed)
        s = 1.0 / np.sqrt(d_model)
        self.E = rng.standard_normal((vocab_size, d_model)) * s
        self.W_enc = rng.standard_normal((d_model, d_model)) * s
        self.W_dec = rng.standard_normal((d_model, d_model)) * s
        self.U = rng.standard_normal((d_model, d_model)) * s
        self.b = rng.standard_normal(d_model) * s
        self.order2 = order2
        self.W_dec2 = (rng.standard_normal((d_model, d_model)) * s
                       if order2 else None)
        self.pos_emb = int(pos_emb)
        self.P = (rng.standard_normal((self.pos_emb, d_model)) * s
                  if self.pos_emb else None)
        self.attn = attn
        if attn:
            self.Penc = rng.standard_normal((enc_pos, d_model)) * s
            self.W_q = rng.standard_normal((d_model, d_model)) * s
            self.W_k = rng.standard_normal((d_model, d_model)) * s
            self.W_v = rng.standard_normal((d_model, d_model)) * s
        else:
            self.Penc = self.W_q = self.W_k = self.W_v = None
        self.d_model = d_model
        self.pad_id, self.eos_id = pad_id, eos_id

    def param_names(self) -> list[str]:
        names = ["E", "W_enc", "W_dec", "U", "b"]
        if self.order2:
            names.append("W_dec2")
        if self.pos_emb:
            names.append("P")
        if self.attn:
            names += ["Penc", "W_q", "W_k", "W_v"]
        return names

    def freeze_for_inference(self):
        """Precompute inference lookup tables (call once after training /
        checkpoint load; weights must not change afterwards).  All three
        rewrites are exact because the pad mask is 0/1:

        - (E @ W_dec)[prev]           == E[prev] @ W_dec   (same dots)
        - (E @ W_v)[ids] * mask       == (E[ids] * mask) @ W_v
        - ((E[v]+Penc[l]) @ W_k)·mask == ((E[ids]+Penc)·mask) @ W_k

        so the encoder's two [B·L,d]@[d,d] gemms and the decoder's
        per-step [A,d]@[d,d] gemm all become row gathers from tables of
        size O(V·d) / O(Lenc·V·d) — the schema vocabulary V is tiny."""
        self._EWdec = self.E @ self.W_dec
        self._EWdec2 = self.E @ self.W_dec2 if self.order2 else None
        if self.attn:
            Lp, d = self.Penc.shape
            Vn = self.E.shape[0]
            kin = (self.E[None, :, :]
                   + self.Penc[:, None, :]).reshape(Lp * Vn, d)
            self._KT = (kin @ self.W_k).reshape(Lp, Vn, d)
            self._EWv = self.E @ self.W_v
        self._frozen = True
        return self

    def _encode_src(self, input_ids: np.ndarray):
        """Shared encoder forward: (mask[B,L,1], token embs, mean ctx@U,
        attention keys/values or None)."""
        mask = (input_ids != self.pad_id).astype(self.E.dtype)[:, :, None]
        emb = self.E[input_ids] * mask
        denom = np.maximum(mask.sum(axis=1), 1.0)
        ctx = np.tanh((emb.sum(axis=1) / denom) @ self.W_enc)       # [B, d]
        ctx_u = ctx @ self.U
        K = V = None
        if self.attn:
            B, L = input_ids.shape
            d = self.d_model
            if getattr(self, "_frozen", False):
                pos = np.arange(L)[None, :]
                K = self._KT[pos, input_ids] * mask
                V = self._EWv[input_ids] * mask
            else:
                # flatten the [B,L,d]@[d,d] to ONE [B·L,d]@[d,d] gemm
                # (numpy otherwise dispatches B tiny per-item gemms)
                kin = emb + self.Penc[:L][None, :, :] * mask
                K = (kin.reshape(B * L, d) @ self.W_k).reshape(B, L, d)
                V = (emb.reshape(B * L, d) @ self.W_v).reshape(B, L, d)
        return mask, emb, denom, ctx, ctx_u, K, V

    def generate(self, input_ids: np.ndarray, max_length: int = 48) -> np.ndarray:
        """Greedy batch decode → id matrix [B, max_length] (pad-filled after
        each row's EOS).

        Active-row compaction: rows that have emitted EOS are dropped from
        the working set each step (their remaining output is pad by
        definition), so per-step cost tracks the number of still-decoding
        sequences instead of the full batch — exact, same outputs."""
        B = input_ids.shape[0]
        mask, _emb, _den, _ctx, ctx_u, K, V = self._encode_src(input_ids)
        neg = (1.0 - mask[:, :, 0]) * -1e9                          # [B, L]
        scale = 1.0 / np.sqrt(self.d_model)
        out = np.full((B, max_length), self.pad_id, dtype=np.int64)
        alive = np.arange(B)                         # row ids still decoding
        prev = np.full(B, self.pad_id, dtype=np.int64)   # decoder start
        prev2 = np.full(B, self.pad_id, dtype=np.int64)
        # E[prev] @ W_dec == (E @ W_dec)[prev] elementwise (identical dot
        # products), so the per-step [B,d]@[d,d] matmul becomes a V×d
        # table lookup — V is tiny (schema vocab); the table is cached by
        # freeze_for_inference, else costs one [V,d]@[d,d] per call
        if getattr(self, "_frozen", False):
            EW, EW2 = self._EWdec, self._EWdec2
        else:
            EW = self.E @ self.W_dec
            EW2 = self.E @ self.W_dec2 if self.order2 else None
        for t in range(max_length):
            pre = EW[prev] + ctx_u + self.b
            if self.order2:
                pre = pre + EW2[prev2]
            if self.pos_emb:
                pre = pre + self.P[min(t, self.pos_emb - 1)]
            h = np.tanh(pre)
            o = h
            if self.attn:
                q = h @ self.W_q                                    # [A, d]
                sc = np.einsum("bd,bld->bl", q, K) * scale + neg
                sc -= sc.max(axis=1, keepdims=True)
                a = np.exp(sc)
                a /= a.sum(axis=1, keepdims=True)
                o = h + np.einsum("bl,bld->bd", a, V)
            logits = o @ self.E.T                                   # [A, V]
            nxt = np.argmax(logits, axis=1)
            out[alive, t] = nxt
            live = nxt != self.eos_id
            if not live.all():
                alive = alive[live]
                if not len(alive):
                    break
                ctx_u = ctx_u[live]
                if self.attn:
                    K, V, neg = K[live], V[live], neg[live]
                prev2 = prev[live]
                prev = nxt[live]
            else:
                prev2 = prev
                prev = nxt
        return out


def train_tiny_seq2seq(model: "TinySeq2Seq", tok: "SELTokenizer",
                       pairs: list[tuple[str, str]], *, epochs: int = 30,
                       batch_size: int = 256, lr: float = 3e-3,
                       enc_len: int = 64, dec_len: int = 48,
                       drop_oov: bool = False,
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
    X = tok.encode_batch([s for s, _ in pairs], max_len=enc_len,
                         drop_oov=drop_oov)
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

    if model.pos_emb:
        assert Yfull.shape[1] <= model.pos_emb, \
            f"dec_len {Yfull.shape[1]} exceeds pos_emb table {model.pos_emb}"
    if model.attn:
        assert X.shape[1] <= model.Penc.shape[0], \
            f"enc_len {X.shape[1]} exceeds Penc table {model.Penc.shape[0]}"
    params = model.param_names()
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
            L = x.shape[1]
            d = model.E.shape[1]
            scale = 1.0 / np.sqrt(d)
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
            if model.pos_emb:
                pre = pre + model.P[:T][None, :, :]
            h = np.tanh(pre)
            o = h
            if model.attn:
                kin = emb + model.Penc[:L][None, :, :] * xm    # [B, L, d]
                K = kin @ model.W_k
                V = emb @ model.W_v
                q = h @ model.W_q                              # [B, T, d]
                sc = np.einsum("btd,bld->btl", q, K) * scale
                sc = sc + (1.0 - xm[:, :, 0])[:, None, :] * -1e9
                sc -= sc.max(axis=2, keepdims=True)
                alpha = np.exp(sc)
                alpha /= alpha.sum(axis=2, keepdims=True)      # [B, T, L]
                att = np.einsum("btl,bld->btd", alpha, V)
                o = h + att
            logits = o @ model.E.T                             # [B, T, V]
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
            dE = flat_dlog.T @ o.reshape(B * T, -1)            # output proj
            do = dlog @ model.E                                # [B, T, d]
            dh = do
            demb = None                                        # grad wrt emb
            if model.attn:
                datt = do
                dV = np.einsum("btl,btd->bld", alpha, datt)
                dalpha = np.einsum("btd,bld->btl", datt, V)
                dsc = alpha * (dalpha
                               - (alpha * dalpha).sum(axis=2, keepdims=True))
                dsc *= scale
                dq = np.einsum("btl,bld->btd", dsc, K)
                dK = np.einsum("btl,btd->bld", dsc, q)
                dW_q = h.reshape(B * T, -1).T @ dq.reshape(B * T, -1)
                dh = dh + dq @ model.W_q.T
                dW_k = kin.reshape(B * L, -1).T @ dK.reshape(B * L, -1)
                dW_v = emb.reshape(B * L, -1).T @ dV.reshape(B * L, -1)
                dkin = dK @ model.W_k.T                        # [B, L, d]
                demb = dkin + dV @ model.W_v.T
                dPenc = np.zeros_like(model.Penc)
                dPenc[:L] = (dkin * xm).sum(axis=0)
            dpre = dh * (1.0 - h * h)                          # [B, T, d]
            flat_dh = dpre.reshape(B * T, -1)
            flat_yin = model.E[yin].reshape(B * T, -1)
            dW_dec = flat_yin.T @ flat_dh
            np.add.at(dE, yin.ravel(), flat_dh @ model.W_dec.T)
            if model.order2:
                flat_yin2 = model.E[yin2].reshape(B * T, -1)
                dW_dec2 = flat_yin2.T @ flat_dh
                np.add.at(dE, yin2.ravel(), flat_dh @ model.W_dec2.T)
            if model.pos_emb:
                dP = np.zeros_like(model.P)
                dP[:T] = dpre.sum(axis=0)
            db = flat_dh.sum(axis=0)
            dctx_u = dpre.sum(axis=1)                          # [B, d]
            dU = ctx.T @ dctx_u
            dctx = dctx_u @ model.U.T
            dmvec = (dctx * (1.0 - ctx * ctx)) @ model.W_enc.T
            dW_enc = mvec.T @ (dctx * (1.0 - ctx * ctx))
            dper_tok = (dmvec[:, None, :] / denom[:, None, :]) * xm
            if demb is not None:
                dper_tok = dper_tok + demb * xm
            np.add.at(dE, x.ravel(),
                      dper_tok.reshape(B * L, -1))
            grads = {"E": dE, "W_enc": dW_enc, "W_dec": dW_dec,
                     "U": dU, "b": db}
            if model.order2:
                grads["W_dec2"] = dW_dec2
            if model.pos_emb:
                grads["P"] = dP
            if model.attn:
                grads.update({"Penc": dPenc, "W_q": dW_q,
                              "W_k": dW_k, "W_v": dW_v})
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


# --------------------------------------------- trained-checkpoint tier -----

EMPTY_SEL = "<extra_id_0> <extra_id_1>"


def build_schema_vocab(dict_rows: list[dict], relation_templates,
                       entity_types) -> list[str]:
    """Task vocabulary for the trained tier: entity alias words + entity
    types + predicate names + relation-infix keywords.  The reference builds
    its tokenizer from the schema's spot/asoc names the same way
    (UIE_torch/t5tokenizer.py:27-133 add_special_tokens over the record
    schema); sorted for determinism."""
    words: set[str] = set()
    for e in dict_rows:
        for a in e["aliases"]:
            words.update(str(a).split())
    words.update(entity_types)
    for pred, _st, _ot, infix in relation_templates:
        words.add(pred)
        words.update(infix.split())
    return sorted(words)


def build_sel_training_corpus(dict_rows: list[dict], relation_templates,
                              event_types=(), *, k_obj: int = 6,
                              mention_repeat: int = 3, n_event: int = 240,
                              n_empty: int = 80,
                              seed: int = 7) -> list[tuple[str, str]]:
    """Deterministic (source sentence, target SEL) fine-tune corpus derived
    from the entity dictionary + relation templates — the analog of the
    reference's seq2struct training set construction (text→SEL pairs built
    from labeled records, UIE_torch/process_data.py:284-350 annonote_graph
    → convert_spot_asoc).  Four sentence populations, matching the synth
    corpus' generative space (synth.py _gen_turn_text):

    - relation sentences ``{subj_surface}{infix}{obj_surface}`` → subject
      spot with (pred, obj) asoc + trailing object spot (k_obj sampled
      objects per subject; alias combinations cycled deterministically);
    - mention sentences (one alias) → single entity spot;
    - event sentences ``alert: {etype} at {LOC} involving {ORG}`` → two
      entity spots, no asoc (events carry no relation triple);
    - filler → empty SEL.
    """
    import random as _random
    rng = _random.Random(seed)
    by_type: dict[str, list[dict]] = {}
    for e in dict_rows:
        by_type.setdefault(e["type"], []).append(e)
    from deepkg_ray.stages.selparse import convert_spot_asoc

    pairs: list[tuple[str, str]] = []
    for pred, st, ot, infix in relation_templates:
        subs, objs = by_type[st], by_type[ot]
        for si, s in enumerate(subs):
            for oi, o in enumerate(rng.sample(objs, min(k_obj, len(objs)))):
                if st == ot and s["name"] == o["name"]:
                    continue
                # every subject-alias × object-alias combination: a subject
                # must see BOTH object suffixes (and vice versa) or the
                # decoder confuses same-type alias suffixes at copy time
                for s_surf in s["aliases"]:
                    for o_surf in o["aliases"]:
                        pairs.append((
                            s_surf + infix + o_surf,
                            convert_spot_asoc([
                                {"type": st, "spot": s_surf,
                                 "asocs": [(pred, o_surf)]},
                                {"type": ot, "spot": o_surf,
                                 "asocs": []}])))
    for e in dict_rows:
        for a in e["aliases"]:
            tgt = convert_spot_asoc([{"type": e["type"], "spot": a,
                                      "asocs": []}])
            pairs.extend([(a, tgt)] * mention_repeat)
    if event_types and "LOC" in by_type and "ORG" in by_type:
        for i in range(n_event):
            p = rng.choice(by_type["LOC"])
            a = rng.choice(by_type["ORG"])
            ps = p["aliases"][i % len(p["aliases"])]
            asur = a["aliases"][(i // 2) % len(a["aliases"])]
            et = list(event_types)[i % len(event_types)]
            pairs.append((
                f"alert: {et} at {ps} involving {asur}",
                convert_spot_asoc([{"type": "LOC", "spot": ps, "asocs": []},
                                   {"type": "ORG", "spot": asur,
                                    "asocs": []}])))
    pairs.extend([("the report about meeting notes", EMPTY_SEL)] * n_empty)
    return pairs


def save_checkpoint(path: str, model: "TinySeq2Seq",
                    vocab_words: list[str], meta: dict | None = None) -> None:
    """Persist weights + tokenizer base vocab + architecture flags as one
    .npz — the pickle-model-store analog (actor-constructor artifact)."""
    import json as _json
    arrays = {p: getattr(model, p) for p in model.param_names()}
    cfg = {"d_model": model.d_model, "order2": model.order2,
           "pos_emb": model.pos_emb, "attn": model.attn,
           "enc_pos": (model.Penc.shape[0] if model.attn else 0),
           "vocab_size": model.E.shape[0], "meta": meta or {}}
    np.savez(path, _cfg=np.frombuffer(
        _json.dumps(cfg).encode(), dtype=np.uint8),
        _vocab=np.array(vocab_words, dtype=object), **arrays)


def load_checkpoint(path: str) -> tuple["TinySeq2Seq", "SELTokenizer", dict]:
    import json as _json
    z = np.load(path, allow_pickle=True)
    cfg = _json.loads(bytes(z["_cfg"]).decode())
    words = [str(w) for w in z["_vocab"]]
    tok = SELTokenizer(words)
    assert len(tok) == cfg["vocab_size"], "checkpoint/vocab mismatch"
    model = TinySeq2Seq(cfg["vocab_size"], d_model=cfg["d_model"],
                        pad_id=tok.pad_id, eos_id=tok.eos_id,
                        order2=cfg["order2"], pos_emb=cfg["pos_emb"],
                        attn=cfg["attn"], enc_pos=max(cfg["enc_pos"], 1))
    for p in model.param_names():
        setattr(model, p, z[p])
    return model, tok, cfg.get("meta", {})
