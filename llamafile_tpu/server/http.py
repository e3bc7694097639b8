"""llamafiler-analog HTTP server: asyncio front end + threaded model executor.

Behavioral port of llamafile/server (reference: server/client.cpp:659-706 URL
routing, prog.cpp:37-134 boot sequence, worker.cpp tokenbucket/preemption,
doc/technical_details.md SSE + cancellation). The TPU twist: all device work
funnels through slot-holding worker threads (the device serializes compute;
slots keep per-conversation KV so prefix reuse works across requests), while
asyncio handles sockets/SSE so thousands of idle connections are cheap.

Endpoints: /v1/chat/completions /v1/completions /v1/embeddings /embedding
/tokenize /detokenize /v1/models /slotz /flagz /health /metrics plus static
www (chat UI) from --www-root.
"""
from __future__ import annotations

import asyncio
import json
import os
import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional

import numpy as np

from ..utils.flags import Flags
from ..version import VERSION_STRING
from .tokenbucket import TokenBucket

JSON_CT = "application/json"


def _lazy_grammar_jits():
    """Compiled grammar-constrained steps (module-level so the jit cache is
    shared across requests). Masks arrive as packed uint8 bits [ceil(V/8)]."""
    import functools

    import jax
    import jax.numpy as jnp

    from ..models.llama import forward
    from ..runtime.sampling import sample

    @functools.partial(jax.jit, static_argnames=("sp", "nv"))
    def masked_sample(sp, logits, maskbits, key, nv: int):
        bits = jnp.unpackbits(maskbits, count=nv)
        masked = jnp.where(bits > 0, logits[:nv], -1e30)
        return sample(masked[None, :], key, sp)

    @functools.partial(jax.jit, static_argnames=("cfg", "sp"))
    def grammar_step(params, cfg, sp, tid, pos, cache, maskbits, key):
        logits, cache = forward(params, cfg, tid, pos, cache,
                                last_idx=jnp.zeros((1,), jnp.int32))
        lg = logits[0, 0]
        bits = jnp.unpackbits(maskbits, count=cfg.n_vocab)
        masked = jnp.where(bits > 0, lg[: cfg.n_vocab], -1e30)
        return sample(masked[None, :], key, sp), cache

    return masked_sample, grammar_step


def _masked_sample_jit(sp, logits, maskbits, key, nv):
    global _GRAMMAR_JITS
    if _GRAMMAR_JITS is None:
        _GRAMMAR_JITS = _lazy_grammar_jits()
    return _GRAMMAR_JITS[0](sp, logits, maskbits, key, nv)


def _grammar_step_jit(params, cfg, sp, tid, pos, cache, maskbits, key):
    global _GRAMMAR_JITS
    if _GRAMMAR_JITS is None:
        _GRAMMAR_JITS = _lazy_grammar_jits()
    return _GRAMMAR_JITS[1](params, cfg, sp, tid, pos, cache, maskbits, key)


_GRAMMAR_JITS = None


class Metrics:
    def __init__(self):
        self.lock = threading.Lock()
        self.requests = 0
        self.tokens_generated = 0
        self.tokens_prefilled = 0
        self.prefix_reused = 0
        self.queue_depth = 0
        self.started = time.time()

    def render(self) -> str:
        with self.lock:
            up = time.time() - self.started
            lines = [
                "# TYPE llamafile_tpu_requests_total counter",
                f"llamafile_tpu_requests_total {self.requests}",
                "# TYPE llamafile_tpu_tokens_generated_total counter",
                f"llamafile_tpu_tokens_generated_total {self.tokens_generated}",
                "# TYPE llamafile_tpu_tokens_prefilled_total counter",
                f"llamafile_tpu_tokens_prefilled_total {self.tokens_prefilled}",
                "# TYPE llamafile_tpu_prefix_tokens_reused_total counter",
                f"llamafile_tpu_prefix_tokens_reused_total {self.prefix_reused}",
                "# TYPE llamafile_tpu_queue_depth gauge",
                f"llamafile_tpu_queue_depth {self.queue_depth}",
                "# TYPE llamafile_tpu_uptime_seconds gauge",
                f"llamafile_tpu_uptime_seconds {up:.0f}",
            ]
        return "\n".join(lines) + "\n"


class Server:
    def __init__(self, flags: Flags, engine=None):
        self.flags = flags
        self.bert = None
        if engine is None and flags.mesh_dp * flags.mesh_tp > 1:
            # multi-chip serving: the batcher drives TPEngine's shard_map'd
            # row_prefill/fused_decode hooks — rows shard over dp, heads/ffn
            # over tp (dense row cache; paged pool stays single-chip)
            from ..models.loader import load_llama
            from ..parallel.tp import TPEngine, make_mesh
            cfg, params, tok, _ = load_llama(flags.model, fuse=False)
            mesh = make_mesh(dp=flags.mesh_dp, tp=flags.mesh_tp)
            engine = TPEngine(cfg, params, tok, mesh,
                              max_seq_len=min(flags.ctx_size,
                                              cfg.max_context))
        if engine is None:
            from ..gguf.reader import GGUFReader
            arch = GGUFReader(flags.model).architecture
            if arch in ("bert", "nomic-bert", "jina-bert-v2"):
                # embedding-model serving (reference benchmark class:
                # all-MiniLM, server/doc/technical_details.md:9-47) — the
                # /v1/embeddings endpoint runs the bert encoder; generation
                # endpoints 400
                from ..models.bert import load_bert
                self.bert = load_bert(flags.model)
            elif arch == "mamba":
                from ..models.mamba import load_mamba
                from ..runtime.engine import Engine
                cfg, params, tok, _ = load_mamba(flags.model)
                engine = Engine(cfg, params, tok,
                                max_seq_len=min(flags.ctx_size,
                                                cfg.max_context))
            else:
                from ..models.loader import load_llama
                from ..runtime.engine import Engine
                cfg, params, tok, _ = load_llama(flags.model)
                engine = Engine(cfg, params, tok,
                                max_seq_len=min(flags.ctx_size,
                                                cfg.max_context))
        self.engine = engine
        if engine is not None:
            from .batcher import Batcher
            rows = max(1, flags.slots)
            dp = getattr(engine, "dp", 1)
            rows = -(-rows // dp) * dp     # round up to whole dp groups
            self.batcher = Batcher(engine, rows=rows,
                                   preempt_after=flags.preempt)
        else:
            self.batcher = None
        # cross-request embedding micro-batching (reference headline bench
        # class: 2,427 req/s on /embedding — technical_details.md:9-47)
        from ..runtime.engine import Engine as _Engine
        from .embed import EmbedBatcher, bert_embed_many, llama_embed_many
        if self.bert is not None:
            self.embedder = EmbedBatcher(bert_embed_many(self.bert))
        elif isinstance(engine, _Engine) and not engine.recurrent:
            self.embedder = EmbedBatcher(
                llama_embed_many(engine),
                tokenize=lambda t: engine.tokenizer.encode(t)[
                    : engine.max_seq_len - 1])
        else:
            self.embedder = None    # TPEngine/mamba: per-request path below
        self.bucket = TokenBucket(flags.token_burst, flags.token_rate,
                                  flags.token_cidr, flags.trust)
        self.metrics = Metrics()
        nwork = flags.workers or (os.cpu_count() or 4) + 4
        self.pool = ThreadPoolExecutor(max_workers=max(2, min(nwork, 64)))
        self.model_id = os.path.basename(flags.model or "model")
        self._llava = None
        self._llava_lock = threading.Lock()

    def llava(self):
        """Lazy mmproj vision encoder (reference: clip_ctx per slot)."""
        if self._llava is None and self.flags.mmproj:
            from ..models.clip import LlavaEncoder
            with self._llava_lock:
                if self._llava is None:
                    self._llava = LlavaEncoder(self.flags.mmproj)
        return self._llava

    # ------------------------------------------------------------------
    # generation core (runs in pool threads)
    # ------------------------------------------------------------------

    def _generate_sync(self, prompt_ids, sp, max_tokens, stop_strs, emit,
                       low_priority=False):
        """Submit to the continuous batcher and stream its output queue.

        Stop strings are matched with holdback: the last len(stop)-1 chars
        stay unemitted until they can no longer begin a stop string, and a
        match truncates the text BEFORE the stop string (reference server
        behavior — the stop text never reaches the client)."""
        tok = self.engine.tokenizer
        t_start = time.time()
        req = self.batcher.submit(prompt_ids, sp, max_tokens,
                                  low_priority=low_priority)
        hold = max((len(s) for s in stop_strs), default=1) - 1
        text_acc = ""
        emitted = 0                  # chars of text_acc already emitted
        n_out = 0
        finish = "length"
        ttft = None
        try:
            while True:
                kind, val = req.out.get(timeout=600)
                if kind == "done":
                    finish = val
                    break
                if kind == "progress":
                    emit({"prefill_progress": val[0] / max(1, val[1])})
                    continue
                if ttft is None:
                    ttft = time.time() - t_start
                piece = tok.decode_token(val).decode("utf-8", errors="replace")
                text_acc += piece
                n_out += 1
                if stop_strs:
                    cut = min((text_acc.find(s) for s in stop_strs
                               if s in text_acc), default=-1)
                    if cut >= 0:
                        req.stop = True
                        finish = "stop"
                        text_acc = text_acc[:cut]
                        if cut > emitted:
                            emit({"piece": text_acc[emitted:]})
                            emitted = cut
                        break
                safe = len(text_acc) - hold
                if safe > emitted:
                    emit({"token": val, "piece": text_acc[emitted:safe]})
                    emitted = safe
            if emitted < len(text_acc):      # flush holdback on done
                emit({"piece": text_acc[emitted:]})
        finally:
            req.stop = True
        with self.metrics.lock:
            self.metrics.tokens_generated += n_out
            self.metrics.tokens_prefilled += len(prompt_ids)
        return {"prompt_tokens": len(prompt_ids),
                "completion_tokens": n_out,
                "finish_reason": finish,
                "ttft_ms": round((ttft or 0.0) * 1e3, 2),
                "text": text_acc}

    async def generate(self, prompt_ids, sp, max_tokens, stop_strs,
                       on_piece=None, multimodal=False, grammar=None,
                       low_priority=False):
        """Async wrapper: runs the right sync generator in the pool, streaming
        pieces. Plain text goes through the continuous batcher; multimodal and
        grammar-constrained requests run on private rows."""
        loop = asyncio.get_running_loop()
        queue: asyncio.Queue = asyncio.Queue()

        def emit(piece):
            loop.call_soon_threadsafe(queue.put_nowait, piece)

        if grammar is not None:
            fut = loop.run_in_executor(self.pool, self._generate_grammar_sync,
                                       prompt_ids, sp, max_tokens, stop_strs,
                                       emit, grammar)
        elif multimodal:
            fut = loop.run_in_executor(self.pool, self._generate_multimodal_sync,
                                       prompt_ids, sp, max_tokens, stop_strs, emit)
        else:
            fut = loop.run_in_executor(self.pool, self._generate_sync, prompt_ids,
                                       sp, max_tokens, stop_strs, emit,
                                       low_priority)
        while True:
            get = asyncio.ensure_future(queue.get())
            done, _ = await asyncio.wait({get, fut},
                                         return_when=asyncio.FIRST_COMPLETED)
            if get in done:
                piece = get.result()
                if on_piece:
                    await on_piece(piece)
                continue
            get.cancel()
            # drain anything left
            while not queue.empty():
                piece = queue.get_nowait()
                if on_piece:
                    await on_piece(piece)
            return fut.result()

    # ------------------------------------------------------------------
    # HTTP plumbing
    # ------------------------------------------------------------------

    # request-read bounds (reference: fixed client ibuf, server/client.h —
    # bodies can't grow unbounded and a stalled sender can't pin a reader)
    MAX_BODY = 32 * 1024 * 1024
    MAX_HEADER_LINES = 100
    IDLE_TIMEOUT = 300.0          # keep-alive idle
    READ_TIMEOUT = 60.0           # per header-line / body read

    async def handle(self, reader: asyncio.StreamReader,
                     writer: asyncio.StreamWriter):
        peer = writer.get_extra_info("peername") or ("?", 0)
        ip = peer[0]
        try:
            while True:
                try:
                    line = await asyncio.wait_for(reader.readline(),
                                                  self.IDLE_TIMEOUT)
                except asyncio.TimeoutError:
                    return
                if not line:
                    return
                try:
                    method, target, _ver = line.decode().split()
                except ValueError:
                    return await self._plain(writer, 400, "bad request line")
                # charge the rate limit BEFORE buffering the body: a
                # throttled client must not make us read its payload first
                if not self.bucket.acquire(ip):
                    return await self._plain(writer, 429, "too many requests")
                headers = {}
                for _ in range(self.MAX_HEADER_LINES):
                    try:
                        h = await asyncio.wait_for(reader.readline(),
                                                   self.READ_TIMEOUT)
                    except asyncio.TimeoutError:
                        return
                    if h in (b"\r\n", b"\n", b""):
                        break
                    k, _, v = h.decode().partition(":")
                    headers[k.strip().lower()] = v.strip()
                else:
                    return await self._plain(writer, 431, "too many headers")
                body = b""
                n = int(headers.get("content-length", 0) or 0)
                if n > self.MAX_BODY:
                    return await self._plain(writer, 413, "body too large")
                if n:
                    try:
                        body = await asyncio.wait_for(reader.readexactly(n),
                                                      self.READ_TIMEOUT)
                    except asyncio.TimeoutError:
                        return
                with self.metrics.lock:
                    self.metrics.requests += 1
                t_req = time.time()
                keep = await self.dispatch(writer, method, target, headers, body)
                from ..utils.log import access_log
                access_log.info("%s %s %s %.0fms", ip, method,
                                target.split("?")[0], (time.time() - t_req) * 1e3)
                await writer.drain()
                if not keep or headers.get("connection", "").lower() == "close":
                    return
        except (asyncio.IncompleteReadError, ConnectionResetError,
                BrokenPipeError):
            pass
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:
                pass

    async def dispatch(self, w, method, target, headers, body) -> bool:
        path = target.split("?", 1)[0]
        prefix = self.flags.url_prefix.rstrip("/")
        if prefix and path.startswith(prefix):
            path = path[len(prefix):] or "/"
        try:
            payload = json.loads(body) if body else {}
        except json.JSONDecodeError:
            await self._json(w, 400, {"error": "invalid JSON body"})
            return True
        if path.startswith("/db/"):
            return await self.ep_db(w, method, path, payload)
        if path.startswith("/slots/"):
            return await self.ep_slot_action(w, method, path, target, payload)
        if self.engine is None and path in (
                "/v1/chat/completions", "/v1/completions", "/completion",
                "/slotz"):
            await self._json(w, 400, {"error":
                             "embedding model: use /v1/embeddings"})
            return True
        route = {
            "/v1/chat/completions": self.ep_chat,
            "/v1/completions": self.ep_completions,
            "/completion": self.ep_completion_legacy,
            "/v1/embeddings": self.ep_embedding,
            "/embedding": self.ep_embedding,
            "/tokenize": self.ep_tokenize,
            "/detokenize": self.ep_detokenize,
            "/v1/models": self.ep_models,
            "/slotz": self.ep_slotz,
            "/flagz": self.ep_flagz,
            "/health": self.ep_health,
            "/metrics": self.ep_metrics,
        }.get(path)
        if route is None:
            return await self.ep_static(w, path)
        return await route(w, method, target, headers, payload)

    async def _plain(self, w, status, text, ct="text/plain"):
        data = text.encode() if isinstance(text, str) else text
        w.write((f"HTTP/1.1 {status} {_reason(status)}\r\n"
                 f"Content-Type: {ct}\r\nContent-Length: {len(data)}\r\n"
                 f"Server: llamafile-tpu/{VERSION_STRING}\r\n\r\n").encode())
        w.write(data)
        return True

    async def _json(self, w, status, obj):
        return await self._plain(w, status, json.dumps(obj), JSON_CT)

    # ------------------------------------------------------------------
    # endpoints
    # ------------------------------------------------------------------

    async def ep_health(self, w, *a):
        # liveness = the DEVICE answers, not just the socket (reference-class
        # servers only check process liveness; accelerator serving needs the
        # chip probed — a hung core otherwise reports healthy while every
        # generation stalls). Probe result is cached for 5s.
        now = time.time()
        if now - getattr(self, "_health_t", 0.0) > 5.0:
            loop = asyncio.get_running_loop()

            def probe():
                import jax
                import jax.numpy as jnp
                return int(jnp.asarray(1) + 1)

            try:
                ok = await asyncio.wait_for(
                    loop.run_in_executor(self.pool, probe), timeout=30.0)
                self._health_ok = (ok == 2)
            except Exception:
                self._health_ok = False
            self._health_t = now
        if getattr(self, "_health_ok", True):
            return await self._json(w, 200, {"status": "ok"})
        return await self._json(w, 503, {"status": "device unresponsive"})

    async def ep_metrics(self, w, *a):
        if self.batcher is not None:
            # reused_tokens is the final admission keep, which already
            # subsumes cross-row shared pages and context-shift relocation —
            # adding those on top would double-count (advice r4)
            st = self.batcher.stats
            with self.metrics.lock:
                self.metrics.prefix_reused = st.get("reused_tokens", 0)
        return await self._plain(w, 200, self.metrics.render(),
                                 "text/plain; version=0.0.4")

    async def ep_models(self, w, *a):
        return await self._json(w, 200, {"object": "list", "data": [{
            "id": self.model_id, "object": "model", "owned_by": "llamafile-tpu",
        }]})

    async def ep_slot_action(self, w, method, path, target, payload):
        """POST /slots/{id}?action=save|restore|erase — per-row KV state
        persistence (llama_state_seq_{save,load}_file analog; upstream
        server slot save/restore surface). Files live under --state-dir;
        refuses path escapes and is disabled when the flag is unset."""
        if method != "POST":
            return await self._json(w, 405, {"error": "POST required"})
        if self.batcher is None:
            return await self._json(w, 400, {"error": "no generation model"})
        state_dir = getattr(self.flags, "state_dir", "")
        if not state_dir:
            return await self._json(
                w, 400, {"error": "server started without --state-dir"})
        try:
            ridx = int(path.split("/")[2])
        except (IndexError, ValueError):
            return await self._json(w, 400, {"error": "bad slot id"})
        from urllib.parse import parse_qs, urlparse
        action = parse_qs(urlparse(target).query).get("action", [""])[0]
        if action not in ("save", "restore", "erase"):
            return await self._json(
                w, 400, {"error": "action must be save|restore|erase"})
        fname = os.path.basename(str(payload.get("filename", "")))
        if action in ("save", "restore") and not fname:
            return await self._json(w, 400, {"error": "filename required"})
        fpath = os.path.join(state_dir, fname)
        loop = asyncio.get_running_loop()
        try:
            if action == "save":
                if not (0 <= ridx < self.batcher.n_rows):
                    return await self._json(w, 400, {"error": "bad slot id"})
                os.makedirs(state_dir, exist_ok=True)
                r = await loop.run_in_executor(
                    self.pool, self.batcher.save_row, ridx, fpath)
            elif action == "restore":
                if not os.path.exists(fpath):
                    return await self._json(w, 404, {"error": "no such file"})
                r = await loop.run_in_executor(
                    self.pool, self.batcher.restore_row, fpath)
            else:
                if not (0 <= ridx < self.batcher.n_rows):
                    return await self._json(w, 400, {"error": "bad slot id"})
                r = await loop.run_in_executor(
                    self.pool, self.batcher.erase_row, ridx)
        except RuntimeError as e:
            return await self._json(w, 409, {"error": str(e)})
        return await self._json(w, 200, r)

    async def ep_slotz(self, w, *a):
        return await self._json(w, 200, {"slots": self.batcher.describe(),
                                         "queued": self.batcher.queue.qsize(),
                                         "cache": self.batcher.describe_stats()})

    async def ep_flagz(self, w, *a):
        from dataclasses import asdict
        return await self._json(w, 200, asdict(self.flags))

    async def ep_tokenize(self, w, method, target, headers, payload):
        text = payload.get("content", payload.get("prompt", ""))
        add_special = payload.get("add_special", True)
        if self.bert is not None:
            ids = self.bert.tokenizer.encode(text)
        else:
            ids = self.engine.tokenizer.encode(
                text, add_bos=add_special and None)
        return await self._json(w, 200, {"tokens": ids})

    async def ep_detokenize(self, w, method, target, headers, payload):
        ids = payload.get("tokens", [])
        return await self._json(w, 200,
                                {"content": self.engine.tokenizer.decode(ids)})

    async def ep_embedding(self, w, method, target, headers, payload):
        inp = payload.get("input", payload.get("content", ""))
        inputs = inp if isinstance(inp, list) else [inp]
        loop = asyncio.get_running_loop()
        if self.embedder is not None:
            # concurrent requests micro-batch into one padded forward
            vecs = await loop.run_in_executor(
                self.pool, self.embedder.embed, inputs)
            tokz = (self.bert.tokenizer if self.bert is not None
                    else self.engine.tokenizer)
            ntok = sum(len(tokz.encode(t)) for t in inputs)
        elif self.bert is not None:
            vecs = await loop.run_in_executor(
                self.pool, lambda: self.bert.embed(inputs).tolist())
            ntok = sum(len(self.bert.tokenizer.encode(t)) for t in inputs)
        else:
            vecs = await loop.run_in_executor(self.pool, self._embed_sync,
                                              inputs)
            ntok = sum(len(self.engine.tokenizer.encode(t)) for t in inputs)
        data = [{"object": "embedding", "index": i, "embedding": v}
                for i, v in enumerate(vecs)]
        return await self._json(w, 200, {
            "object": "list", "data": data, "model": self.model_id,
            "usage": {"prompt_tokens": ntok},
        })

    def _embed_sync(self, texts):
        import jax.numpy as jnp
        from ..models.llama import forward, init_cache
        eng = self.engine
        out = []
        for t in texts:
            ids = eng.tokenizer.encode(t)[: eng.max_seq_len - 1]
            from ..runtime.engine import bucket_len
            b = bucket_len(len(ids))
            toks = np.zeros((1, b), np.int32)
            toks[0, : len(ids)] = ids
            cache = init_cache(eng.cfg, 1, b)
            hidden, _ = forward(eng.params, eng.cfg, jnp.asarray(toks),
                                jnp.zeros((1,), jnp.int32), cache,
                                return_hidden=True)
            h = np.asarray(hidden[0, : len(ids)], np.float64)
            v = h.mean(axis=0)
            v = v / (np.linalg.norm(v) + 1e-12)       # normalized (embedding.cpp:44-57)
            out.append(v.tolist())
        return out

    def _extract_images(self, payload):
        """Pull image parts out of OpenAI content arrays; returns (messages
        with <image> markers, list of encoded ImageAtoms)."""
        from ..runtime.atoms import IMAGE_PLACEHOLDER, image_atom, parse_data_uri
        images = []
        messages = []
        for m in payload.get("messages", []):
            c = m.get("content", "")
            if isinstance(c, list):
                text = ""
                for part in c:
                    if part.get("type") == "image_url":
                        url = part["image_url"]["url"] if isinstance(
                            part.get("image_url"), dict) else part.get("image_url")
                        enc = self.llava()
                        if enc is None:
                            continue    # no --mmproj: drop images
                        raw = parse_data_uri(url)
                        images.append(image_atom(enc.embed_bytes(raw), raw))
                        text += IMAGE_PLACEHOLDER
                    elif part.get("type") == "text":
                        text += part.get("text", "")
                messages.append({"role": m.get("role", "user"), "content": text})
            else:
                messages.append({"role": m.get("role", "user"), "content": str(c)})
        return messages, images

    def _chat_prompt_ids(self, payload) -> list:
        from ..runtime.chat import apply_chat_template
        messages = payload.get("messages", [])
        tok = self.engine.tokenizer
        prompt = apply_chat_template(
            [{"role": m.get("role", "user"), "content": _content_str(m)}
             for m in messages],
            self.flags.chat_template or tok.chat_template)
        ids = tok.encode(prompt)
        # auto message forgetting when over context (v1_chat_completions.cpp:565-597)
        limit = self.engine.max_seq_len - self._reserve()
        while len(ids) > limit and len(messages) > 2:
            messages = [messages[0]] + messages[3:] if messages[0].get("role") == "system" \
                else messages[2:]
            prompt = apply_chat_template(
                [{"role": m.get("role", "user"), "content": _content_str(m)}
                 for m in messages],
                self.flags.chat_template or tok.chat_template)
            ids = tok.encode(prompt)
        return ids[-limit:] if len(ids) > limit else ids

    def _reserve(self) -> int:
        r = self.flags.reserve_tokens
        return r if r >= 0 else max(16, self.engine.max_seq_len * 15 // 100)

    def _sp(self, payload):
        from ..runtime.sampling import SamplingParams
        # OpenAI-style logit_bias map ({"token_id": bias}) -> hashable tuple
        lb = payload.get("logit_bias") or {}
        try:
            bias = tuple(sorted((int(t), float(x)) for t, x in lb.items()))
        except (TypeError, ValueError, AttributeError):
            bias = ()
        return SamplingParams(
            temperature=float(payload.get("temperature", self.flags.temp)),
            top_p=float(payload.get("top_p", self.flags.top_p)),
            top_k=int(payload.get("top_k", self.flags.top_k)),
            min_p=float(payload.get("min_p", self.flags.min_p)),
            tfs_z=float(payload.get("tfs_z", 1.0)),
            typical_p=float(payload.get("typical_p", 1.0)),
            dynatemp_range=float(payload.get("dynatemp_range", 0.0)),
            dynatemp_exponent=float(payload.get("dynatemp_exponent", 1.0)),
            repeat_penalty=float(payload.get("repeat_penalty", 1.0)),
            presence_penalty=float(payload.get("presence_penalty", 0.0)),
            frequency_penalty=float(payload.get("frequency_penalty", 0.0)),
            penalty_last_n=int(payload.get("repeat_last_n",
                                           payload.get("penalty_last_n", 64))),
            logit_bias=bias,
            seed=int(payload.get("seed", self.flags.seed)),
            mirostat=int(payload.get("mirostat", self.flags.mirostat)),
            mirostat_tau=float(payload.get("mirostat_tau",
                                           self.flags.mirostat_tau)),
            mirostat_eta=float(payload.get("mirostat_eta",
                                           self.flags.mirostat_eta)),
        )

    async def ep_chat(self, w, method, target, headers, payload):
        if method != "POST":
            return await self._json(w, 405, {"error": "POST required"})
        has_images = any(isinstance(m.get("content"), list)
                         and any(p.get("type") == "image_url"
                                 for p in m["content"])
                         for m in payload.get("messages", []))
        if has_images and self.flags.mmproj:
            return await self._run_multimodal(w, payload)
        ids = self._chat_prompt_ids(payload)
        return await self._run_completion(
            w, payload, ids, chat=True,
            low_priority=headers.get("x-priority", "") == "batch")

    async def _run_multimodal(self, w, payload):
        from ..runtime.chat import apply_chat_template
        from ..runtime.atoms import atomize
        messages, images = self._extract_images(payload)
        tok = self.engine.tokenizer
        prompt = apply_chat_template(messages,
                                     self.flags.chat_template or tok.chat_template)
        atoms = atomize(prompt, tok, images)
        return await self._run_completion(w, payload, atoms, chat=True,
                                          multimodal=True)

    def _generate_multimodal_sync(self, atoms, sp, max_tokens, stop_strs, emit):
        """Single-row multimodal generation (image atoms bypass the batcher)."""
        import jax
        from ..models.llama import init_cache
        from ..runtime.sampling import sample
        from ..runtime.engine import _decode_scan
        eng = self.engine
        tok = eng.tokenizer
        t_start = time.time()
        cache = init_cache(eng.cfg, 1, eng.max_seq_len, eng.kv_dtype)
        last, cache, n = eng.prefill_atoms(cache, atoms)
        ttft = time.time() - t_start
        key = jax.random.PRNGKey(sp.seed or int(time.time() * 1e6) % 2**31)
        key, sub = jax.random.split(key)
        cur = sample(np.asarray(last)[None, :], sub, sp)
        import jax.numpy as jnp
        pos = jnp.full((1,), n, jnp.int32)
        text_acc = ""
        n_out = 0
        finish = "length"
        while n_out < max_tokens and int(pos[0]) + 1 < eng.max_seq_len:
            chunk = min(8, max_tokens - n_out, eng.max_seq_len - 1 - int(pos[0]))
            toks, cur, pos, cache, key, _, _mu = _decode_scan(
                eng.params, eng.cfg, sp, cur, pos, cache, key, None, chunk)
            done = False
            for tid in np.asarray(toks)[0].tolist():
                if tok.is_eog(tid):
                    finish = "stop"
                    done = True
                    break
                piece = tok.decode_token(tid).decode("utf-8", errors="replace")
                text_acc += piece
                n_out += 1
                emit({"token": tid, "piece": piece})
                if (stop_strs and any(s in text_acc for s in stop_strs)) \
                        or n_out >= max_tokens:
                    finish = "stop" if stop_strs else finish
                    done = True
                    break
            if done:
                break
        with self.metrics.lock:
            self.metrics.tokens_generated += n_out
        return {"prompt_tokens": n, "completion_tokens": n_out,
                "finish_reason": finish, "ttft_ms": round(ttft * 1e3, 2),
                "text": text_acc}

    async def ep_completion_legacy(self, w, method, target, headers, payload):
        """llama.cpp-server-style /completion (n_predict, content result)."""
        payload = dict(payload)
        if "n_predict" in payload and "max_tokens" not in payload:
            payload["max_tokens"] = payload["n_predict"]
        ids = self.engine.tokenizer.encode(str(payload.get("prompt", "")))
        limit = self.engine.max_seq_len - self._reserve()
        sp = self._sp(payload)
        grammar = None
        try:
            grammar = self._grammar_for(payload)
        except Exception as e:
            return await self._json(w, 400, {"error": str(e)})
        usage = await self.generate(ids[-limit:], sp,
                                    int(payload.get("max_tokens", 128) or 128),
                                    payload.get("stop") or [], grammar=grammar)
        return await self._json(w, 200, {
            "content": usage["text"],
            "stop": usage["finish_reason"] == "stop",
            "tokens_predicted": usage["completion_tokens"],
            "tokens_evaluated": usage["prompt_tokens"],
            "timings": {"ttft_ms": usage["ttft_ms"]},
        })

    async def ep_completions(self, w, method, target, headers, payload):
        if method != "POST":
            return await self._json(w, 405, {"error": "POST required"})
        prompt = payload.get("prompt", "")
        if isinstance(prompt, list):
            prompt = "".join(prompt)
        ids = self.engine.tokenizer.encode(prompt)
        limit = self.engine.max_seq_len - self._reserve()
        ids = ids[-limit:]
        return await self._run_completion(
            w, payload, ids, chat=False,
            low_priority=headers.get("x-priority", "") == "batch")

    def _grammar_for(self, payload):
        """response_format json_schema/json_object -> Grammar, or a raw GBNF
        `grammar` param (reference: v1_chat_completions.cpp:460-510)."""
        from ..runtime.grammar import Grammar
        rf = payload.get("response_format") or {}
        if payload.get("grammar"):
            return Grammar.from_gbnf(payload["grammar"])
        if rf.get("type") == "json_schema":
            schema = rf.get("json_schema", {})
            schema = schema.get("schema", schema)
            return Grammar.from_json_schema(schema)
        if rf.get("type") == "json_object":
            return Grammar.from_json_schema({})
        return None

    def _generate_grammar_sync(self, prompt_ids, sp, max_tokens, stop_strs,
                               emit, grammar):
        """Constrained decoding with ON-DEVICE masking: the pushdown stacks
        advance on the host (inherent — the next mask depends on the accepted
        token), but the allowed-token mask travels to the device as packed
        bits (V/8 bytes) and the forward + mask + full sampling chain run in
        ONE compiled step per token. Round 2 downloaded full f32 logits every
        token (4V bytes over the tunnel) and sampled on host."""
        import jax
        import jax.numpy as jnp
        from ..models.llama import init_cache
        from ..runtime.grammar import GrammarSampler
        eng = self.engine
        tok = eng.tokenizer
        gs = GrammarSampler(grammar, tok)
        t_start = time.time()
        cache = init_cache(eng.cfg, 1, eng.max_seq_len, eng.kv_dtype)
        last, cache = eng.prefill(cache, prompt_ids)   # device [V]
        ttft = time.time() - t_start
        key = jax.random.PRNGKey(sp.seed or int(time.time() * 1e6) % 2**31)
        nv = eng.cfg.n_vocab

        def pack(mask):
            m = np.zeros((nv,), bool)
            m[: min(len(mask), nv)] = mask[:nv]
            return jnp.asarray(np.packbits(m))

        pos = len(prompt_ids)
        text_acc = ""
        n_out = 0
        finish = "length"
        key, sub = jax.random.split(key)
        tid = int(_masked_sample_jit(sp, last, pack(gs.allowed_tokens()),
                                     sub, nv)[0])
        for _ in range(max_tokens):
            if tok.is_eog(tid):
                finish = "stop"
                break
            gs.accept(tid)
            piece = tok.decode_token(tid).decode("utf-8", errors="replace")
            text_acc += piece
            n_out += 1
            emit({"token": tid, "piece": piece})
            if gs.done and not any(len(s) for s in gs.stacks):
                finish = "stop"
                break
            if pos + 1 >= eng.max_seq_len or n_out >= max_tokens:
                break
            key, sub = jax.random.split(key)
            nxt, cache = _grammar_step_jit(
                eng.params, eng.cfg, sp, jnp.asarray([[tid]], jnp.int32),
                jnp.asarray([pos], jnp.int32), cache,
                pack(gs.allowed_tokens()), sub)
            tid = int(nxt[0])
            pos += 1
        with self.metrics.lock:
            self.metrics.tokens_generated += n_out
        return {"prompt_tokens": len(prompt_ids), "completion_tokens": n_out,
                "finish_reason": finish, "ttft_ms": round(ttft * 1e3, 2),
                "text": text_acc}

    async def _run_completion(self, w, payload, ids, chat: bool,
                              multimodal: bool = False,
                              low_priority: bool = False):
        sp = self._sp(payload)
        try:
            grammar = self._grammar_for(payload)
        except Exception as e:
            return await self._json(w, 400, {"error": f"bad grammar/schema: {e}"})
        max_tokens = int(payload.get("max_tokens",
                                     payload.get("n_predict", 0)) or 0)
        if max_tokens <= 0:
            max_tokens = self.engine.max_seq_len - len(ids) - 1
        stop = payload.get("stop") or []
        if isinstance(stop, str):
            stop = [stop]
        rid = ("chatcmpl-" if chat else "cmpl-") + uuid.uuid4().hex[:24]
        created = int(time.time())
        obj = "chat.completion" if chat else "text_completion"
        if payload.get("stream"):
            w.write((f"HTTP/1.1 200 OK\r\nContent-Type: text/event-stream\r\n"
                     "Cache-Control: no-store\r\nConnection: close\r\n"
                     "Transfer-Encoding: chunked\r\n\r\n").encode())

            async def send_evt(data):
                blob = f"data: {json.dumps(data)}\n\n".encode()
                w.write(f"{len(blob):x}\r\n".encode() + blob + b"\r\n")
                await w.drain()

            if chat:
                await send_evt({"id": rid, "object": obj + ".chunk",
                                "created": created, "model": self.model_id,
                                "choices": [{"index": 0, "delta": {"role": "assistant"},
                                             "finish_reason": None}]})

            async def on_piece(p):
                if "prefill_progress" in p:
                    # reference x_prefill_progress events: long prompts
                    # stream ingestion progress before the first token
                    # (v1_chat_completions.cpp:630-644)
                    await send_evt({
                        "id": rid, "object": obj + (".chunk" if chat else ""),
                        "created": created, "model": self.model_id,
                        "x_prefill_progress": round(p["prefill_progress"], 4),
                        "choices": [{"index": 0, "delta": {"content": ""},
                                     "finish_reason": None} if chat else
                                    {"index": 0, "text": "",
                                     "finish_reason": None}]})
                    return
                delta = ({"content": p["piece"]} if chat else None)
                choice = ({"index": 0, "delta": delta, "finish_reason": None}
                          if chat else
                          {"index": 0, "text": p["piece"], "finish_reason": None})
                await send_evt({"id": rid, "object": obj + (".chunk" if chat else ""),
                                "created": created, "model": self.model_id,
                                "choices": [choice]})

            usage = await self.generate(ids, sp, max_tokens, stop, on_piece,
                                        multimodal=multimodal, grammar=grammar,
                                        low_priority=low_priority)
            final_choice = ({"index": 0, "delta": {},
                             "finish_reason": usage["finish_reason"]} if chat else
                            {"index": 0, "text": "",
                             "finish_reason": usage["finish_reason"]})
            await send_evt({"id": rid, "object": obj + (".chunk" if chat else ""),
                            "created": created, "model": self.model_id,
                            "choices": [final_choice],
                            "usage": _usage(usage)})
            blob = b"data: [DONE]\n\n"
            w.write(f"{len(blob):x}\r\n".encode() + blob + b"\r\n0\r\n\r\n")
            return False
        usage = await self.generate(ids, sp, max_tokens, stop,
                                    multimodal=multimodal, grammar=grammar,
                                    low_priority=low_priority)
        text = usage.pop("text")
        choice = ({"index": 0, "message": {"role": "assistant", "content": text},
                   "finish_reason": usage["finish_reason"]} if chat else
                  {"index": 0, "text": text,
                   "finish_reason": usage["finish_reason"]})
        return await self._json(w, 200, {
            "id": rid, "object": obj, "created": created,
            "model": self.model_id, "choices": [choice], "usage": _usage(usage),
        })

    def _db(self):
        if not getattr(self, "_db_inst", None):
            if not self.flags.db:
                return None
            from .db import Db
            self._db_inst = Db(self.flags.db)
        return self._db_inst

    async def ep_db(self, w, method, path, payload):
        """Chat persistence REST (reference: client.cpp:709-725 route stubs +
        llamafile/db.cpp)."""
        db = self._db()
        if db is None:
            return await self._json(w, 404, {"error": "no --db configured"})
        parts = [p for p in path.split("/") if p][1:]     # after "db"
        if parts == ["chats"]:
            if method == "POST":
                cid = db.create_chat(self.model_id, payload.get("title", ""))
                return await self._json(w, 200, {"id": cid})
            return await self._json(w, 200, {"chats": db.list_chats()})
        if len(parts) == 2 and parts[0] == "chats":
            cid = int(parts[1])
            if method == "DELETE":
                db.delete_chat(cid)
                return await self._json(w, 200, {"ok": True})
            chat = db.get_chat(cid)
            if chat is None:
                return await self._json(w, 404, {"error": "no such chat"})
            chat["messages"] = db.list_messages(cid)
            return await self._json(w, 200, chat)
        if len(parts) == 3 and parts[0] == "chats" and parts[2] == "messages":
            cid = int(parts[1])
            if method == "POST":
                mid = db.add_message(cid, payload.get("role", "user"),
                                     payload.get("content", ""),
                                     float(payload.get("temperature", 0.0)),
                                     float(payload.get("top_p", 1.0)))
                return await self._json(w, 200, {"id": mid})
            return await self._json(w, 200, {"messages": db.list_messages(cid)})
        return await self._json(w, 404, {"error": "unknown db route"})

    async def ep_static(self, w, path):
        # default www root = packaged chat UI (reference default: /zip/www)
        root = self.flags.www_root or os.path.join(os.path.dirname(__file__), "www")
        safe = os.path.normpath(path).lstrip("/") or "index.html"
        full = os.path.join(root, safe)
        if not os.path.abspath(full).startswith(os.path.abspath(root)):
            return await self._plain(w, 403, "forbidden")
        if os.path.isdir(full):
            full = os.path.join(full, "index.html")
        if not os.path.exists(full):
            return await self._plain(w, 404, "not found")
        ct = {"html": "text/html", "js": "text/javascript", "css": "text/css",
              "png": "image/png", "svg": "image/svg+xml",
              "json": JSON_CT}.get(full.rsplit(".", 1)[-1], "application/octet-stream")
        return await self._plain(w, 200, open(full, "rb").read(), ct)


def _usage(u):
    return {"prompt_tokens": u["prompt_tokens"],
            "completion_tokens": u["completion_tokens"],
            "total_tokens": u["prompt_tokens"] + u["completion_tokens"],
            "ttft_ms": u.get("ttft_ms")}


def _content_str(m) -> str:
    c = m.get("content", "")
    if isinstance(c, list):  # OpenAI content-parts form
        return "".join(p.get("text", "") for p in c if p.get("type") == "text")
    return str(c)


def _reason(status: int) -> str:
    return {200: "OK", 400: "Bad Request", 403: "Forbidden", 404: "Not Found",
            405: "Method Not Allowed", 429: "Too Many Requests",
            500: "Internal Server Error"}.get(status, "OK")


async def _amain(server: Server, host: str, port: int, ready=None):
    srv = await asyncio.start_server(server.handle, host, port)
    if ready is not None:
        ready.set_result((host, port))
    print(f"llamafile-tpu server listening on http://{host}:{port}/")
    async with srv:
        await srv.serve_forever()


def serve(flags: Flags, engine=None) -> int:
    host, _, port = flags.listen.rpartition(":")
    server = Server(flags, engine)
    try:
        asyncio.run(_amain(server, host or "127.0.0.1", int(port)))
    except KeyboardInterrupt:
        print("shutdown")
    return 0
