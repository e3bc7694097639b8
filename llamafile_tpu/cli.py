"""Program mux + terminal chatbot + raw completion CLI.

Analog of the reference's patched main (main_main.cpp.patch:149-183 program
selection) and llamafile/chatbot_*.cpp (REPL with slash commands,
chatbot_help.cpp:49-142). One entry point:

  python -m llamafile_tpu.cli --model m.gguf --cli -p "..." -n 32   # raw completion
  python -m llamafile_tpu.cli --model m.gguf --chat                 # REPL (default on tty)
  python -m llamafile_tpu.cli --model m.gguf --server               # HTTP server
  python -m llamafile_tpu.cli --tokenize -m m.gguf -p "text"
"""
from __future__ import annotations

import sys
import time
from typing import List, Optional

from .utils.flags import Flags, parse_flags
from .version import VERSION_STRING


def _load_engine(flags: Flags):
    from .runtime.engine import Engine
    from .models.loader import load_llama
    t0 = time.time()
    n_chips = flags.mesh_dp * flags.mesh_tp
    if n_chips > 1:
        # multi-chip serving: Megatron dp x tp sharding over the mesh
        from .parallel.tp import TPEngine, make_mesh
        cfg, params, tok, _reader = load_llama(flags.model, fuse=False)
        mesh = make_mesh(dp=flags.mesh_dp, tp=flags.mesh_tp)
        eng = TPEngine(cfg, params, tok, mesh,
                       max_seq_len=min(flags.ctx_size, cfg.max_context))
        print(f"loaded {flags.model} on dp={flags.mesh_dp} x "
              f"tp={flags.mesh_tp} mesh in {time.time()-t0:.1f}s",
              file=sys.stderr)
        return eng
    from .gguf.reader import GGUFReader
    loras = []
    if flags.lora or flags.lora_scaled:
        from .models.lora import parse_lora_args
        loras = parse_lora_args(flags.lora, flags.lora_scaled)
    if GGUFReader(flags.model).architecture == "mamba":
        from .models.mamba import load_mamba
        cfg, params, tok, _reader = load_mamba(flags.model)
    else:
        # LoRA targets per-projection tensors: keep them unfused
        cfg, params, tok, _reader = load_llama(flags.model,
                                               fuse=not loras)
    for lp, ls in loras:
        from .models.lora import apply_lora
        params = apply_lora(params, cfg, lp, ls)
        print(f"lora: applied {lp} (scale {ls})", file=sys.stderr)
    max_ctx = cfg.max_context
    if flags.grp_attn_n > 1:
        max_ctx *= flags.grp_attn_n   # self-extend: ctx beyond training
    eng = Engine(cfg, params, tok,
                 max_seq_len=min(flags.ctx_size, max_ctx),
                 grp_attn_n=flags.grp_attn_n, grp_attn_w=flags.grp_attn_w)
    print(f"loaded {flags.model}: {cfg.n_layers}L d{cfg.d_model} "
          f"vocab {cfg.n_vocab} in {time.time()-t0:.1f}s", file=sys.stderr)
    return eng


def run_cli(flags: Flags) -> int:
    eng = _load_engine(flags)
    prompt = flags.prompt or ""
    n = flags.n_predict if flags.n_predict > 0 else 128
    t0 = time.time()
    count = 0
    if flags.image:
        # llava one-shot (reference llava CLI: -m llm --mmproj mm --image f)
        if not flags.mmproj:
            print("--image requires --mmproj", file=sys.stderr)
            return 1
        count = _run_cli_image(eng, flags, prompt, n)
    else:
        for _tid, piece in eng.generate(prompt, max_tokens=n,
                                        sampling=flags.sampling(),
                                        prompt_cache=(flags.prompt_cache
                                                      or None)):
            sys.stdout.write(piece)
            sys.stdout.flush()
            count += 1
    dt = time.time() - t0
    print(f"\n[{count} tokens, {count/max(dt,1e-9):.1f} tok/s]", file=sys.stderr)
    return 0


def _run_cli_image(eng, flags: Flags, prompt: str, n: int) -> int:
    """Image + prompt atoms -> prefill -> streamed decode."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image
    from .models.clip import LlavaEncoder
    from .runtime.atoms import image_atom
    from .runtime.engine import _decode_scan
    from .runtime.sampling import sample
    enc = LlavaEncoder(flags.mmproj)
    emb = enc.embed(Image.open(flags.image))
    sp = flags.sampling()
    atoms = ([image_atom(emb)]
             + list(eng.tokenizer.encode(prompt or "describe this image")))
    cache = eng.new_cache()
    last, cache, pos0 = eng.prefill_atoms(cache, atoms)
    key = jax.random.PRNGKey(sp.seed)
    key, sub = jax.random.split(key)
    cur = sample(jnp.asarray(last)[None, :], sub, sp)
    pos = jnp.full((1,), pos0, jnp.int32)
    count = 0
    while count < n and int(pos[0]) + 1 < eng.max_seq_len:
        chunk = min(8, n - count, eng.max_seq_len - 1 - int(pos[0]))
        toks, cur, pos, cache, key, _, _ = _decode_scan(
            eng.params, eng.cfg, sp, cur, pos, cache, key, None, chunk)
        for tid in np.asarray(toks)[0].tolist():
            if eng.tokenizer.is_eog(tid):
                return count
            sys.stdout.write(eng.tokenizer.decode_token(tid).decode(
                "utf-8", errors="replace"))
            sys.stdout.flush()
            count += 1
            if count >= n:
                return count
    return count


HELP = """\
slash commands (reference: llamafile chatbot_help.cpp):
  /help            show this help
  /context         print context-window usage
  /stats           print timing statistics
  /clear           wipe conversation history
  /undo            remove last exchange
  /forget          drop oldest exchange
  /push /pop       save/restore a conversation checkpoint
  /stack           print the checkpoint stack
  /upload FILE     share a text file (or image, with --mmproj) with the model
  /exit            quit
"""


def _upload_file(path: str, messages: List[dict], flags: Flags) -> str:
    """/upload FILE (reference chatbot_help.cpp:45,119-137): text files become
    a readonly markdown system message with content + metadata; images need
    --mmproj and ride the next turn as a vision atom."""
    import os
    if not os.path.exists(path):
        return f"no such file: {path}"
    ext = os.path.splitext(path)[1].lower()
    if ext in (".jpg", ".jpeg", ".png", ".gif", ".bmp", ".webp"):
        if not flags.mmproj:
            return "image upload needs --mmproj (clip vision model)"
        messages.append({"role": "user", "content": [
            {"type": "image_path", "path": path}]})
        return f"image {path} attached to the next turn"
    data = open(path, "rb").read()
    if b"\x00" in data:
        return "files with NUL characters are not supported"
    text = data.decode("utf-8", errors="replace")
    st = os.stat(path)
    lang = {".py": "python", ".c": "c", ".cpp": "cpp", ".js": "javascript",
            ".md": "markdown", ".json": "json", ".sh": "bash"}.get(ext, "")
    messages.append({"role": "system", "content":
                     f"The user shared the file `{path}` "
                     f"({st.st_size} bytes). You have readonly access to its "
                     f"content:\n\n```{lang}\n{text}\n```"})
    return f"shared {path} ({st.st_size} bytes) with the assistant"


def _multimodal_turn(eng, flags: Flags, messages: List[dict], n: int):
    """One /upload-image turn: whole conversation templated with the image
    spliced in as a vision atom, decoded on a private cache (no session
    reuse for the image turn)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image
    from .models.clip import LlavaEncoder
    from .runtime.atoms import IMAGE_PLACEHOLDER, atomize, image_atom
    from .runtime.chat import apply_chat_template
    from .runtime.engine import _decode_scan
    from .runtime.sampling import sample
    enc = LlavaEncoder(flags.mmproj)
    flat, images = [], []
    for m in messages:
        c = m.get("content")
        if isinstance(c, list):
            txt = " ".join(p.get("text", "") for p in c
                           if p.get("type") == "text")
            for p in c:
                if p.get("type") == "image_path":
                    images.append(image_atom(enc.embed(Image.open(p["path"]))))
                    txt = IMAGE_PLACEHOLDER + "\n" + txt
            flat.append({"role": m["role"], "content": txt})
        else:
            flat.append(m)
    prompt = apply_chat_template(flat, eng.tokenizer.chat_template)
    atoms = atomize(prompt, eng.tokenizer, images)
    sp = flags.sampling()
    cache = eng.new_cache()
    last, cache, pos0 = eng.prefill_atoms(cache, atoms)
    key = jax.random.PRNGKey(sp.seed)
    key, sub = jax.random.split(key)
    cur = sample(jnp.asarray(last)[None, :], sub, sp)
    pos = jnp.full((1,), pos0, jnp.int32)
    count = 0
    tid0 = int(cur[0])
    if eng.tokenizer.is_eog(tid0):
        return
    yield tid0, eng.tokenizer.decode_token(tid0).decode("utf-8",
                                                        errors="replace")
    count += 1
    while count < n and int(pos[0]) + 1 < eng.max_seq_len:
        chunk = min(8, n - count, eng.max_seq_len - 1 - int(pos[0]))
        toks, cur, pos, cache, key, _, _ = _decode_scan(
            eng.params, eng.cfg, sp, cur, pos, cache, key, None, chunk)
        for tid in np.asarray(toks)[0].tolist():
            if eng.tokenizer.is_eog(tid):
                return
            yield tid, eng.tokenizer.decode_token(tid).decode(
                "utf-8", errors="replace")
            count += 1
            if count >= n:
                return


def run_chat(flags: Flags, with_server: bool = False) -> int:
    from .runtime.chat import apply_chat_template
    from .utils.highlight import StreamHighlighter
    try:  # bestline analog: history + emacs keybindings via readline
        import readline  # noqa: F401
    except ImportError:
        pass
    eng = _load_engine(flags)
    from .runtime.engine import ChatSession
    session = ChatSession(eng)      # KV kept across turns; suffix-only prefill
    tok = eng.tokenizer
    if with_server:
        # reference chatbot_main.cpp:83-91: --chat --server runs the HTTP
        # server on a background thread sharing the chat's engine
        import asyncio
        import threading
        from .server.http import Server, _amain
        host, _, port = flags.listen.rpartition(":")
        srv = Server(flags, eng)

        def _serve():
            loop = asyncio.new_event_loop()
            asyncio.set_event_loop(loop)
            loop.run_until_complete(_amain(srv, host or "127.0.0.1",
                                           int(port)))

        threading.Thread(target=_serve, daemon=True).start()
        print(f"server listening on http://{flags.listen}/ (background)",
              file=sys.stderr)
    print(f"llamafile-tpu {VERSION_STRING} chat — /help for commands",
          file=sys.stderr)
    messages: List[dict] = []
    stack: List[int] = []
    stats = {"tokens": 0, "seconds": 0.0}
    while True:
        try:
            line = input(">>> ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if not line:
            continue
        if line.startswith("/"):
            cmd = line.split()[0]
            if cmd in ("/exit", "/quit", "/bye"):
                return 0
            if cmd == "/help":
                print(HELP)
            elif cmd == "/clear":
                messages.clear()
                print("cleared")
            elif cmd == "/undo":
                while messages and messages[-1]["role"] != "user":
                    messages.pop()
                if messages:
                    messages.pop()
                print("undone")
            elif cmd == "/forget":
                del messages[: 2]
                print("forgot oldest exchange")
            elif cmd == "/push":
                stack.append(len(messages))
                print(f"pushed @{len(messages)}")
            elif cmd == "/pop":
                if stack:
                    del messages[stack.pop():]
                    print("popped")
                else:
                    print("stack empty")
            elif cmd == "/stack":
                if stack:
                    for i, off in enumerate(stack):
                        print(f"  [{i}] @{off} messages")
                else:
                    print("stack empty")
            elif cmd == "/upload":
                parts = line.split(maxsplit=1)
                print(_upload_file(parts[1], messages, flags)
                      if len(parts) == 2 else "usage: /upload FILE")
            elif cmd == "/context":
                prompt = apply_chat_template(messages, tok.chat_template)
                used = len(tok.encode(prompt))
                print(f"{used}/{eng.max_seq_len} tokens used")
            elif cmd == "/stats":
                s = stats["seconds"] or 1e-9
                print(f"{stats['tokens']} tokens in {stats['seconds']:.1f}s "
                      f"({stats['tokens']/s:.1f} tok/s)")
            else:
                print(f"unknown command {cmd} (try /help)")
            continue
        pending_image = bool(messages) and isinstance(
            messages[-1].get("content"), list)
        if pending_image:
            messages[-1]["content"].append({"type": "text", "text": line})
        else:
            messages.append({"role": "user", "content": line})
        t0 = time.time()
        reply = []
        hl = StreamHighlighter(enabled=sys.stdout.isatty())
        n = flags.n_predict if flags.n_predict > 0 else 512
        if pending_image:
            gen = _multimodal_turn(eng, flags, messages, n)
        else:
            prompt = apply_chat_template(messages, tok.chat_template)
            gen = session.generate(tok.encode(prompt), max_tokens=n,
                                   sampling=flags.sampling())
        for _tid, piece in gen:
            sys.stdout.write(hl.feed(piece))
            sys.stdout.flush()
            reply.append(piece)
        sys.stdout.write(hl.flush())
        print()
        stats["tokens"] += len(reply)
        stats["seconds"] += time.time() - t0
        messages.append({"role": "assistant", "content": "".join(reply)})
        if pending_image:
            # keep later TEXT turns templatable: flatten the image turn
            texts = [p["text"] for p in messages[-2]["content"]
                     if p.get("type") == "text"]
            messages[-2] = {"role": "user",
                            "content": "[image] " + " ".join(texts)}


def run_tokenize(flags: Flags) -> int:
    from .models.loader import load_llama
    from .gguf.reader import GGUFReader
    from .runtime.tokenizer import Tokenizer
    r = GGUFReader(flags.model)
    tok = Tokenizer(r.metadata)
    for tid in tok.encode(flags.prompt or ""):
        print(f"{tid}\t{tok.tokens[tid]!r}")
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    mode = "chat" if sys.stdin.isatty() else "cli"
    seen = []
    for m in ("cli", "chat", "server", "tokenize", "version"):
        if f"--{m}" in argv:
            argv.remove(f"--{m}")
            mode = m
            seen.append(m)
    # --chat --server together: REPL with the HTTP server on a background
    # thread (reference chatbot_main.cpp:83-91)
    chat_with_server = set(seen) >= {"chat", "server"}
    if chat_with_server:
        mode = "chat"
    if mode == "version":
        print(VERSION_STRING)
        return 0
    from .utils.platform import apply_platform_env
    apply_platform_env()
    flags = parse_flags(argv)
    from .utils.log import setup as _log_setup
    _log_setup(verbose=flags.verbose)
    if mode != "version" and not flags.model:
        print("error: --model required", file=sys.stderr)
        return 1
    if flags.trap:
        from .utils.tracing import enable_trap
        enable_trap()
        print("NaN/Inf trapping enabled (--trap)", file=sys.stderr)
    if flags.trace:
        import atexit
        from .utils import tracing
        tracer = tracing.enable_tracing(flags.trace)
        atexit.register(tracer.write)
        print(f"tracing to {flags.trace} (Chrome about://tracing)", file=sys.stderr)
    if mode == "cli":
        return run_cli(flags)
    if mode == "chat":
        return run_chat(flags, with_server=chat_with_server)
    if mode == "tokenize":
        return run_tokenize(flags)
    if mode == "server":
        from .server.http import serve
        return serve(flags)
    return 1


if __name__ == "__main__":
    sys.exit(main())
