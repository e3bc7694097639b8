"""Whisper speech-to-text: ggml-bin model parser + JAX encoder/decoder.

TPU-native re-design of whisperfile (reference: whisper.cpp.patches/ —
patched whisper.cpp main + server; SURVEY.md §2.9 sibling engines). Parses the
whisper.cpp ggml container (magic 'ggml', hparams, mel filterbank, byte-level
vocab, tensor records), computes the log-mel spectrogram on host (numpy rfft
with the model's own filterbank), runs the conv+transformer encoder and the
causal+cross-attention decoder as jit'd JAX functions, greedy decode with the
standard special-token protocol (sot/language/task/notimestamps).
"""
from __future__ import annotations

import struct
import wave
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

WHISPER_MAGIC = 0x67676D6C  # 'ggml'

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
CHUNK_S = 30


@dataclass
class WhisperHParams:
    n_vocab: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_text_ctx: int
    n_text_state: int
    n_text_head: int
    n_text_layer: int
    n_mels: int
    ftype: int


class WhisperModel:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            data = f.read()
        pos = 0

        def u32():
            nonlocal pos
            (v,) = struct.unpack_from("<i", data, pos)
            pos += 4
            return v

        magic = u32()
        if magic != WHISPER_MAGIC:
            raise ValueError(f"not a whisper ggml file (magic {magic:#x})")
        hp = WhisperHParams(*[u32() for _ in range(11)])
        self.hparams = hp
        # mel filterbank
        n_mel = u32()
        n_fft = u32()
        filt = np.frombuffer(data, np.float32, n_mel * n_fft, pos)
        pos += 4 * n_mel * n_fft
        self.mel_filters = filt.reshape(n_mel, n_fft).copy()
        # vocab: byte-level strings
        n_vocab = u32()
        self.tokens: List[bytes] = []
        for _ in range(n_vocab):
            ln = u32()
            self.tokens.append(data[pos:pos + ln])
            pos += ln
        # special ids (whisper.cpp conventions, gpt2-large vocab = 51864,
        # multilingual = 51865+)
        self.eot = hp.n_vocab - 1 if hp.n_vocab < 51865 else 50257
        if hp.n_vocab >= 51865:
            self.eot = 50257
            self.sot = 50258
            self.lang_base = 50259
            self.tok_translate = 50358
            self.tok_transcribe = 50359
            self.no_speech = 50362
            self.no_timestamps = 50363
            self.timestamp_begin = 50364
            self.multilingual = True
        else:  # english-only
            self.eot = 50256
            self.sot = 50257
            self.lang_base = -1
            self.tok_translate = 50358
            self.tok_transcribe = 50358
            self.no_speech = 50361
            self.no_timestamps = 50362
            self.timestamp_begin = 50363
            self.multilingual = False
        # tensors
        self.tensors: Dict[str, jnp.ndarray] = {}
        while pos < len(data):
            n_dims = u32()
            name_len = u32()
            ttype = u32()
            dims = [u32() for _ in range(n_dims)]
            name = data[pos:pos + name_len].decode()
            pos += name_len
            n = int(np.prod(dims))
            if ttype == 0:      # f32
                arr = np.frombuffer(data, np.float32, n, pos)
                pos += 4 * n
            elif ttype == 1:    # f16
                arr = np.frombuffer(data, np.float16, n, pos).astype(np.float32)
                pos += 2 * n
            else:
                from ..gguf.quants import TYPE_BY_ID, dequantize
                spec = TYPE_BY_ID[ttype]
                nbytes = n // spec.block_elems * spec.block_bytes
                arr = dequantize(
                    np.frombuffer(data, np.uint8, nbytes, pos), ttype,
                    tuple(reversed(dims)))
                pos += nbytes
            self.tensors[name] = jnp.asarray(
                np.ascontiguousarray(arr).reshape(tuple(reversed(dims))))
        self._enc = jax.jit(self._encode_impl)
        self._dec = jax.jit(self._decode_impl)

    # -- audio front end ----------------------------------------------------

    def log_mel(self, samples: np.ndarray) -> np.ndarray:
        """f32 mono 16k samples -> [n_mels, 3000] log-mel (whisper.cpp mel)."""
        n_target = CHUNK_S * SAMPLE_RATE
        x = np.zeros(n_target + N_FFT, np.float32)
        s = samples[: n_target].astype(np.float32)
        x[N_FFT // 2: N_FFT // 2 + len(s)] = s
        # reflect-pad the head like whisper
        x[: N_FFT // 2] = s[1: N_FFT // 2 + 1][::-1] if len(s) > N_FFT // 2 else 0
        window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
        frames = 1 + (n_target) // HOP
        mat = np.lib.stride_tricks.sliding_window_view(x, N_FFT)[::HOP][:frames]
        spec = np.abs(np.fft.rfft(mat * window, axis=1)) ** 2     # [T, 201]
        mel = spec @ self.mel_filters.T                            # [T, n_mels]
        logm = np.log10(np.maximum(mel, 1e-10))
        logm = np.maximum(logm, logm.max() - 8.0)
        logm = (logm + 4.0) / 4.0
        return logm.T[:, :3000].astype(np.float32)                # [n_mels, 3000]

    # -- encoder ------------------------------------------------------------

    def _encode_impl(self, mel: jax.Array) -> jax.Array:
        t = self.tensors
        hp = self.hparams
        x = mel.T                                              # [3000, n_mels]
        # conv1 k=3 s=1 same-pad, gelu
        w1 = t["encoder.conv1.weight"]                          # [state, mels, 3]
        xp = jnp.pad(x, ((1, 1), (0, 0)))
        x = (jnp.einsum("tm,sm->ts", xp[0:-2], w1[:, :, 0])
             + jnp.einsum("tm,sm->ts", xp[1:-1], w1[:, :, 1])
             + jnp.einsum("tm,sm->ts", xp[2:], w1[:, :, 2]))
        x = jax.nn.gelu(x + t["encoder.conv1.bias"], approximate=False)
        # conv2 k=3 s=2, gelu -> [1500, state]
        w2 = t["encoder.conv2.weight"]
        xp = jnp.pad(x, ((1, 1), (0, 0)))
        x = (jnp.einsum("tm,sm->ts", xp[0:-2:2], w2[:, :, 0])
             + jnp.einsum("tm,sm->ts", xp[1:-1:2], w2[:, :, 1])
             + jnp.einsum("tm,sm->ts", xp[2::2], w2[:, :, 2]))
        x = jax.nn.gelu(x + t["encoder.conv2.bias"], approximate=False)
        x = x + t["encoder.positional_embedding"][: x.shape[0]]
        hd = hp.n_audio_state // hp.n_audio_head

        def ln(v, pre):
            mu = v.mean(-1, keepdims=True)
            var = ((v - mu) ** 2).mean(-1, keepdims=True)
            return (v - mu) * jax.lax.rsqrt(var + 1e-5) * t[pre + ".weight"] \
                + t[pre + ".bias"]

        for i in range(hp.n_audio_layer):
            p = f"encoder.blocks.{i}"
            h = ln(x, p + ".attn_ln")
            q = h @ t[p + ".attn.query.weight"].T + t[p + ".attn.query.bias"]
            k = h @ t[p + ".attn.key.weight"].T
            v = h @ t[p + ".attn.value.weight"].T + t[p + ".attn.value.bias"]
            tt = x.shape[0]
            q = q.reshape(tt, -1, hd).transpose(1, 0, 2) * (hd ** -0.25)
            k = k.reshape(tt, -1, hd).transpose(1, 0, 2) * (hd ** -0.25)
            v = v.reshape(tt, -1, hd).transpose(1, 0, 2)
            att = jax.nn.softmax(q @ k.transpose(0, 2, 1), axis=-1)
            o = (att @ v).transpose(1, 0, 2).reshape(tt, -1)
            x = x + (o @ t[p + ".attn.out.weight"].T + t[p + ".attn.out.bias"])
            h = ln(x, p + ".mlp_ln")
            h = jax.nn.gelu(h @ t[p + ".mlp.0.weight"].T + t[p + ".mlp.0.bias"],
                            approximate=False)
            x = x + (h @ t[p + ".mlp.2.weight"].T + t[p + ".mlp.2.bias"])
        return ln(x, "encoder.ln_post")

    def encode(self, mel: np.ndarray) -> jax.Array:
        return self._enc(jnp.asarray(mel))

    # -- decoder ------------------------------------------------------------

    def _decode_impl(self, tokens: jax.Array, audio: jax.Array) -> jax.Array:
        """Full-prefix decoder forward (no KV cache — text is short);
        tokens int32 [T]; audio [Ta, state]. Returns logits [T, n_vocab]."""
        t = self.tensors
        hp = self.hparams
        T = tokens.shape[0]
        hd = hp.n_text_state // hp.n_text_head
        x = t["decoder.token_embedding.weight"][tokens] \
            + t["decoder.positional_embedding"][:T]

        def ln(v, pre):
            mu = v.mean(-1, keepdims=True)
            var = ((v - mu) ** 2).mean(-1, keepdims=True)
            return (v - mu) * jax.lax.rsqrt(var + 1e-5) * t[pre + ".weight"] \
                + t[pre + ".bias"]

        causal = jnp.tril(jnp.ones((T, T), bool))
        for i in range(hp.n_text_layer):
            p = f"decoder.blocks.{i}"
            h = ln(x, p + ".attn_ln")
            q = (h @ t[p + ".attn.query.weight"].T + t[p + ".attn.query.bias"])
            k = h @ t[p + ".attn.key.weight"].T
            v = h @ t[p + ".attn.value.weight"].T + t[p + ".attn.value.bias"]
            q = q.reshape(T, -1, hd).transpose(1, 0, 2) * (hd ** -0.25)
            k = k.reshape(T, -1, hd).transpose(1, 0, 2) * (hd ** -0.25)
            v = v.reshape(T, -1, hd).transpose(1, 0, 2)
            scores = q @ k.transpose(0, 2, 1)
            scores = jnp.where(causal[None], scores, -1e30)
            o = (jax.nn.softmax(scores, axis=-1) @ v).transpose(1, 0, 2).reshape(T, -1)
            x = x + (o @ t[p + ".attn.out.weight"].T + t[p + ".attn.out.bias"])
            # cross attention
            h = ln(x, p + ".cross_attn_ln")
            q = (h @ t[p + ".cross_attn.query.weight"].T
                 + t[p + ".cross_attn.query.bias"])
            ck = audio @ t[p + ".cross_attn.key.weight"].T
            cv = (audio @ t[p + ".cross_attn.value.weight"].T
                  + t[p + ".cross_attn.value.bias"])
            Ta = audio.shape[0]
            q = q.reshape(T, -1, hd).transpose(1, 0, 2) * (hd ** -0.25)
            ck = ck.reshape(Ta, -1, hd).transpose(1, 0, 2) * (hd ** -0.25)
            cv = cv.reshape(Ta, -1, hd).transpose(1, 0, 2)
            o = (jax.nn.softmax(q @ ck.transpose(0, 2, 1), axis=-1) @ cv)
            o = o.transpose(1, 0, 2).reshape(T, -1)
            x = x + (o @ t[p + ".cross_attn.out.weight"].T
                     + t[p + ".cross_attn.out.bias"])
            h = ln(x, p + ".mlp_ln")
            h = jax.nn.gelu(h @ t[p + ".mlp.0.weight"].T + t[p + ".mlp.0.bias"],
                            approximate=False)
            x = x + (h @ t[p + ".mlp.2.weight"].T + t[p + ".mlp.2.bias"])
        x = ln(x, "decoder.ln")
        return x @ t["decoder.token_embedding.weight"].T

    # -- incremental decoder (self-attn KV cache + precomputed cross K/V) ---

    def _cross_kv(self, audio: jax.Array):
        t = self.tensors
        out = []
        for i in range(self.hparams.n_text_layer):
            p = f"decoder.blocks.{i}"
            ck = audio @ t[p + ".cross_attn.key.weight"].T
            cv = (audio @ t[p + ".cross_attn.value.weight"].T
                  + t[p + ".cross_attn.value.bias"])
            out.append((ck, cv))
        return out

    def _decode_step_impl(self, tok, pos, kcache, vcache, cross_k, cross_v):
        """One cached decode step. tok [1] int32; pos scalar int32;
        k/vcache [L, 448, state]; cross_k/v [L, Ta, state]."""
        t = self.tensors
        hp = self.hparams
        hd = hp.n_text_state // hp.n_text_head
        x = (t["decoder.token_embedding.weight"][tok]
             + t["decoder.positional_embedding"][pos][None, :])    # [1, state]

        def ln(v, pre):
            mu = v.mean(-1, keepdims=True)
            var = ((v - mu) ** 2).mean(-1, keepdims=True)
            return (v - mu) * jax.lax.rsqrt(var + 1e-5) * t[pre + ".weight"] \
                + t[pre + ".bias"]

        smax = kcache.shape[1]
        mask = (jnp.arange(smax) <= pos)[None, None, :]
        for i in range(hp.n_text_layer):
            p = f"decoder.blocks.{i}"
            h = ln(x, p + ".attn_ln")
            q = h @ t[p + ".attn.query.weight"].T + t[p + ".attn.query.bias"]
            k = h @ t[p + ".attn.key.weight"].T
            v = h @ t[p + ".attn.value.weight"].T + t[p + ".attn.value.bias"]
            kcache = kcache.at[i, pos].set(k[0])
            vcache = vcache.at[i, pos].set(v[0])
            qh = q.reshape(1, -1, hd).transpose(1, 0, 2) * (hd ** -0.25)
            kh = kcache[i].reshape(smax, -1, hd).transpose(1, 0, 2) * (hd ** -0.25)
            vh = vcache[i].reshape(smax, -1, hd).transpose(1, 0, 2)
            s = jnp.where(mask, qh @ kh.transpose(0, 2, 1), -1e30)
            o = (jax.nn.softmax(s, axis=-1) @ vh).transpose(1, 0, 2).reshape(1, -1)
            x = x + (o @ t[p + ".attn.out.weight"].T + t[p + ".attn.out.bias"])
            h = ln(x, p + ".cross_attn_ln")
            q = (h @ t[p + ".cross_attn.query.weight"].T
                 + t[p + ".cross_attn.query.bias"])
            ta = cross_k.shape[1]
            qh = q.reshape(1, -1, hd).transpose(1, 0, 2) * (hd ** -0.25)
            ckh = cross_k[i].reshape(ta, -1, hd).transpose(1, 0, 2) * (hd ** -0.25)
            cvh = cross_v[i].reshape(ta, -1, hd).transpose(1, 0, 2)
            o = (jax.nn.softmax(qh @ ckh.transpose(0, 2, 1), axis=-1) @ cvh)
            o = o.transpose(1, 0, 2).reshape(1, -1)
            x = x + (o @ t[p + ".cross_attn.out.weight"].T
                     + t[p + ".cross_attn.out.bias"])
            h = ln(x, p + ".mlp_ln")
            h = jax.nn.gelu(h @ t[p + ".mlp.0.weight"].T + t[p + ".mlp.0.bias"],
                            approximate=False)
            x = x + (h @ t[p + ".mlp.2.weight"].T + t[p + ".mlp.2.bias"])
        x = ln(x, "decoder.ln")
        return (x @ t["decoder.token_embedding.weight"].T)[0], kcache, vcache

    # -- transcription ------------------------------------------------------

    def _apply_timestamp_rules(self, lg: np.ndarray, seq: List[int],
                               max_initial_ts: int = 50) -> None:
        """Whisper timestamp decoding constraints, in place on logits.

        Reference semantics: whisper.cpp whisper_process_logits (the patched
        whisper.cpp in whisper.cpp.patches ships them unchanged): timestamps
        are monotonic, come in pairs, the first sampled token is a timestamp,
        and when the aggregate timestamp probability beats every text token
        the decoder is forced onto a timestamp."""
        tb = self.timestamp_begin
        lg[self.no_timestamps] = -np.inf
        last_ts = len(seq) >= 1 and seq[-1] >= tb
        pen_ts = len(seq) < 2 or seq[-2] >= tb
        if last_ts:
            if pen_ts:                      # completed pair: must be text
                lg[tb:] = -np.inf
            else:                           # lone timestamp: pair or EOT
                lg[:self.eot] = -np.inf
        seen_ts = [t for t in seq if t >= tb]
        if seen_ts:                         # monotonic timestamps
            lg[tb:max(seen_ts) + (0 if last_ts else 1)] = -np.inf
        if not seq:                         # first token is a timestamp
            lg[:tb] = -np.inf
            lg[tb + max_initial_ts + 1:] = -np.inf
        # aggregate-probability rule
        m = lg.max()
        probs = np.exp(lg - m)
        probs /= probs.sum()
        ts_p = probs[tb:].sum()
        if ts_p > 0 and probs[:tb].max() < ts_p and not last_ts:
            lg[:tb] = -np.inf

    def _decode_window(self, cross_k, cross_v, language: str, translate: bool,
                       temperature: float, rng: np.random.Generator,
                       max_tokens: int, with_ts: bool):
        """One 30s window decode pass. Returns (tokens, avg_logprob)."""
        hp = self.hparams
        if not hasattr(self, "_step"):
            self._step = jax.jit(self._decode_step_impl)
        kcache = jnp.zeros((hp.n_text_layer, hp.n_text_ctx, hp.n_text_state))
        vcache = jnp.zeros_like(kcache)
        toks = [self.sot]
        if self.multilingual:
            toks.append(self.lang_base + LANG_IDS.get(language, 0))
            toks.append(self.tok_translate if translate
                        else self.tok_transcribe)
        if not with_ts:
            toks.append(self.no_timestamps)
        logits = None
        for pos, tk in enumerate(toks):
            logits, kcache, vcache = self._step(
                jnp.asarray([tk], jnp.int32), jnp.int32(pos), kcache, vcache,
                cross_k, cross_v)
        out: List[int] = []
        sum_lp = 0.0
        for _ in range(max_tokens):
            lg = np.array(logits, np.float32)
            lg[self.sot] = -np.inf
            if with_ts:
                self._apply_timestamp_rules(lg, out)
            else:
                lg[self.no_timestamps] = -np.inf
                lg[self.timestamp_begin:] = -np.inf
            if temperature > 0:
                z = (lg - lg.max()) / temperature
                p = np.exp(z)
                p /= p.sum()
                nxt = int(rng.choice(len(p), p=p))
            else:
                nxt = int(np.argmax(lg))
            m = lg.max()
            lp = float(lg[nxt] - (m + np.log(np.exp(lg - m).sum())))
            sum_lp += lp
            if nxt == self.eot or len(toks) + len(out) >= hp.n_text_ctx - 1:
                break
            out.append(nxt)
            logits, kcache, vcache = self._step(
                jnp.asarray([nxt], jnp.int32),
                jnp.int32(len(toks) + len(out) - 1),
                kcache, vcache, cross_k, cross_v)
        return out, sum_lp / max(1, len(out) + 1)

    def _decode_window_beam(self, cross_k, cross_v, language: str,
                            translate: bool, max_tokens: int, with_ts: bool,
                            beam_size: int):
        """Beam-search window decode (whisper.cpp --beam-size): all beams
        step as ONE vmapped batch; candidate scoring is summed logprob with
        the same timestamp rules as the greedy path applied per beam.
        Returns (tokens, avg_logprob) of the best finished hypothesis."""
        hp = self.hparams
        if not hasattr(self, "_step_v"):
            self._step_v = jax.jit(jax.vmap(
                self._decode_step_impl, in_axes=(0, None, 0, 0, None, None)))
        if not hasattr(self, "_step"):
            self._step = jax.jit(self._decode_step_impl)
        kc = jnp.zeros((hp.n_text_layer, hp.n_text_ctx, hp.n_text_state))
        vc = jnp.zeros_like(kc)
        prompt = [self.sot]
        if self.multilingual:
            prompt.append(self.lang_base + LANG_IDS.get(language, 0))
            prompt.append(self.tok_translate if translate
                          else self.tok_transcribe)
        if not with_ts:
            prompt.append(self.no_timestamps)
        logits = None
        for pos, tk in enumerate(prompt):
            logits, kc, vc = self._step(jnp.asarray([tk], jnp.int32),
                                        jnp.int32(pos), kc, vc,
                                        cross_k, cross_v)
        bs = beam_size
        kcb = jnp.broadcast_to(kc[None], (bs,) + kc.shape)
        vcb = jnp.broadcast_to(vc[None], (bs,) + vc.shape)
        lgb = np.tile(np.asarray(logits, np.float32)[None], (bs, 1))
        beams = [{"out": [], "lp": 0.0} for _ in range(bs)]
        live = 1                        # identical beams: expand only beam 0
        finished: List[tuple] = []
        for step in range(max_tokens):
            cands = []                  # (score, beam_idx, token, lp)
            for b in range(live):
                lg = lgb[b].copy()
                lg[self.sot] = -np.inf
                if with_ts:
                    self._apply_timestamp_rules(lg, beams[b]["out"])
                else:
                    lg[self.no_timestamps] = -np.inf
                    lg[self.timestamp_begin:] = -np.inf
                m = lg.max()
                lps = lg - (m + np.log(np.exp(lg - m).sum()))
                for tok in np.argpartition(-lps, bs)[:bs + 1]:
                    lp = float(lps[tok])
                    cands.append((beams[b]["lp"] + lp, b, int(tok), lp))
            cands.sort(key=lambda c: -c[0])
            nxt, parents, toks_next = [], [], []
            for score, b, tok, lp in cands:
                if tok == self.eot:
                    out = beams[b]["out"]
                    finished.append((score / (len(out) + 1), out))
                    continue
                nxt.append({"out": beams[b]["out"] + [tok], "lp": score})
                parents.append(b)
                toks_next.append(tok)
                if len(nxt) == bs:
                    break
            if len(finished) >= bs or not nxt or \
                    len(prompt) + step + 1 >= hp.n_text_ctx - 1:
                break
            n_live = len(nxt)          # before batch-shape padding
            while len(parents) < bs:   # pad the vmapped batch with beam 0
                parents.append(parents[0])
                toks_next.append(toks_next[0])
                nxt.append(dict(nxt[0]))
            pidx = jnp.asarray(parents, jnp.int32)
            kcb = kcb[pidx]
            vcb = vcb[pidx]
            lgb_j, kcb, vcb = self._step_v(
                jnp.asarray(toks_next, jnp.int32)[:, None],
                jnp.int32(len(prompt) + step), kcb, vcb, cross_k, cross_v)
            lgb = np.asarray(lgb_j, np.float32)
            beams = nxt
            live = n_live              # pads are dead weight, not live beams
        if not finished:                # length-capped: best live beam
            b = max(range(live), key=lambda i: beams[i]["lp"])
            out = beams[b]["out"]
            return out, beams[b]["lp"] / (len(out) + 1)
        finished.sort(key=lambda f: -f[0])
        return finished[0][1], finished[0][0]

    def _text(self, toks: List[int]) -> str:
        return b"".join(self.tokens[t] for t in toks
                        if t < self.timestamp_begin and t < len(self.tokens)
                        and t < self.eot).decode("utf-8", errors="replace")

    def transcribe_segments(self, samples: np.ndarray, language: str = "en",
                            translate: bool = False, max_tokens: int = 224,
                            temperatures=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
                            logprob_thold: float = -1.0,
                            compression_thold: float = 2.4,
                            no_timestamps: bool = False,
                            best_of: int = 5,
                            beam_size: int = 0,
                            seed: int = 0) -> List[dict]:
        """Long-form transcription: 30s seek windows, timestamp tokens parsed
        into segments, temperature-ladder fallback when quality gates fail
        (whisper.cpp main-loop semantics: avg-logprob and compression-ratio
        thresholds escalate the temperature).

        Returns [{"t0": sec, "t1": sec, "text": str}, ...].
        """
        import zlib
        rng = np.random.default_rng(seed)
        hp = self.hparams
        segments: List[dict] = []
        seek = 0
        n = len(samples)
        window_s = CHUNK_S
        while seek < n:
            window = samples[seek: seek + window_s * SAMPLE_RATE]
            if len(window) < SAMPLE_RATE // 10:
                break
            mel = self.log_mel(window)
            if mel.shape[0] != hp.n_mels:
                raise ValueError(f"model wants {hp.n_mels} mels")
            cross = self._cross_kv(self.encode(mel))
            cross_k = jnp.stack([c[0] for c in cross])
            cross_v = jnp.stack([c[1] for c in cross])
            toks: List[int] = []
            for temp in temperatures:
                # t=0: beam search when beam_size > 1 (whisper.cpp
                # --beam-size), else greedy; t>0: sample best_of candidates
                # and keep the best average logprob (greedy.best_of)
                if temp == 0 and beam_size > 1:
                    toks, avg_lp = self._decode_window_beam(
                        cross_k, cross_v, language, translate, max_tokens,
                        with_ts=not no_timestamps, beam_size=beam_size)
                else:
                    n_cand = 1 if temp == 0 else best_of
                    best_lp = -float("inf")
                    for _ in range(n_cand):
                        cand, lp = self._decode_window(
                            cross_k, cross_v, language, translate, temp, rng,
                            max_tokens, with_ts=not no_timestamps)
                        if lp > best_lp:
                            toks, avg_lp, best_lp = cand, lp, lp
                text = self._text(toks)
                comp = (len(text.encode()) /
                        max(1, len(zlib.compress(text.encode())))
                        if len(text) > 16 else 1.0)
                if avg_lp >= logprob_thold and comp <= compression_thold:
                    break
            off = seek / SAMPLE_RATE
            tb = self.timestamp_begin
            if no_timestamps:
                segments.append({"t0": off,
                                 "t1": off + len(window) / SAMPLE_RATE,
                                 "text": self._text(toks)})
                seek += len(window)
                continue
            # parse <t0> text <t1> [<t2> text <t3> ...]
            last_end = None
            t0 = None
            run: List[int] = []
            for t in toks:
                if t >= tb:
                    if t0 is None:
                        t0 = (t - tb) * 0.02
                    else:
                        t1 = (t - tb) * 0.02
                        if run:
                            segments.append({"t0": off + t0, "t1": off + t1,
                                             "text": self._text(run)})
                        last_end = t1
                        t0 = t1
                        run = []
                else:
                    run.append(t)
            if run:            # trailing text without a closing timestamp
                t1 = max(t0 or 0.0, len(window) / SAMPLE_RATE)
                segments.append({"t0": off + (t0 or 0.0), "t1": off + t1,
                                 "text": self._text(run)})
                last_end = None
            if last_end and last_end > 0.1 and len(window) == \
                    window_s * SAMPLE_RATE:
                seek += int(last_end * SAMPLE_RATE)
            else:
                seek += len(window)
        return segments

    def transcribe(self, samples: np.ndarray, language: str = "en",
                   translate: bool = False, max_tokens: int = 224,
                   **kw) -> str:
        segs = self.transcribe_segments(samples, language, translate,
                                        max_tokens, no_timestamps=True, **kw)
        return "".join(s["text"] for s in segs)


LANG_IDS = {l: i for i, l in enumerate(
    "en zh de es ru ko fr ja pt tr pl ca nl ar sv it id hi fi vi he uk el ms cs"
    " ro da hu ta no th ur hr bg lt la mi ml cy sk te fa lv bn sr az sl kn et"
    " mk br eu is hy ne mn bs kk sq sw gl mr pa si km sn yo so af oc ka be tg"
    " sd gu am yi lo uz fo ht ps tk nn mt sa lb my bo tl mg as tt haw ln ha ba"
    " jw su".split())}


def read_wav(path: str) -> np.ndarray:
    """Audio file (WAV any rate/width; mp3/ogg/flac via SDL_mixer) ->
    mono f32 @16k. See utils.audio (reference: vendored miniaudio/dr_wav,
    whisper.cpp.patches / SURVEY.md §2.9)."""
    from ..utils.audio import load_audio
    return load_audio(path, SAMPLE_RATE)
