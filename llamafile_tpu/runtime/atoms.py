"""Atoms: uniform prompt representation of tokens and images.

Behavioral port of llamafiler's Atom (reference: llamafile/server/atom.h:24-49 —
a tagged word that is either a token id or an Image pointer, enabling
multimodal prefix caching; atomize.cpp splits prompt text on image markers).
Here an atom is an int token id or an ImageAtom carrying precomputed LLM
embeddings plus a content hash so prefix comparison works across requests.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Sequence, Union

import numpy as np

IMAGE_PLACEHOLDER = "<image>"


@dataclass
class ImageAtom:
    embeds: np.ndarray          # [n_tokens, d_model] f32
    digest: str                 # content hash for prefix matching

    @property
    def n_tokens(self) -> int:
        return self.embeds.shape[0]

    def key(self):
        return ("img", self.digest)


Atom = Union[int, ImageAtom]


def image_atom(embeds: np.ndarray, raw_bytes: bytes = b"") -> ImageAtom:
    digest = hashlib.sha1(raw_bytes or embeds.tobytes()).hexdigest()
    return ImageAtom(np.asarray(embeds, np.float32), digest)


def atom_keys(atoms: Sequence[Atom]) -> List:
    """Comparable keys for prefix matching (token id or image digest)."""
    return [a if isinstance(a, int) else a.key() for a in atoms]


def atom_count(atoms: Sequence[Atom]) -> int:
    """Total LLM positions occupied."""
    return sum(1 if isinstance(a, int) else a.n_tokens for a in atoms)


def atomize(text: str, tokenizer, images: Sequence[ImageAtom],
            add_bos: bool = True) -> List[Atom]:
    """Split text on IMAGE_PLACEHOLDER and interleave image atoms
    (reference: server/atomize.cpp behavior)."""
    parts = text.split(IMAGE_PLACEHOLDER)
    atoms: List[Atom] = []
    img_iter = iter(images)
    for i, part in enumerate(parts):
        if i > 0:
            try:
                atoms.append(next(img_iter))
            except StopIteration:
                pass
        if part:
            ids = tokenizer.encode(part, add_bos=add_bos and i == 0)
            atoms.extend(int(t) for t in ids)
    if not parts[0] and add_bos and atoms and not isinstance(atoms[0], int):
        atoms.insert(0, tokenizer.bos_id)
    # any leftover images (text had fewer placeholders): prepend after bos
    for img in img_iter:
        atoms.append(img)
    return atoms


def parse_data_uri(uri: str) -> bytes:
    """data:image/...;base64,XXXX -> raw bytes (reference: datauri.cpp)."""
    import base64
    if not uri.startswith("data:"):
        raise ValueError("not a data URI")
    header, _, payload = uri.partition(",")
    if ";base64" in header:
        return base64.b64decode(payload)
    from urllib.parse import unquote_to_bytes
    return unquote_to_bytes(payload)
