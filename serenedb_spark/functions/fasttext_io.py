"""Pure-Python reader + minimal inference for the PUBLISHED fastText
``.bin`` model format.

The reference binds the fastText C++ library to run classification and
nearest-neighbor dictionaries (server/pg/commands/
create_tsdictionary.cpp:535 loads a supervised model, :549 an embedding
model). The ``fasttext`` Python package is not installable in this
environment, so the optional-model seams (functions/optional_models.py)
fall back to THIS reader: a struct-level implementation of the on-disk
format that fastText's own ``saveModel`` writes (fastText source,
``src/fasttext.cc`` / ``src/dictionary.cc`` / ``src/densematrix.cc`` —
public code; no fastText code is copied, only the documented layout):

  int32  magic   = 793712314 (FASTTEXT_FILEFORMAT_MAGIC_INT32)
  int32  version = 12
  args:  12 × int32 (dim ws epoch minCount neg wordNgrams loss model
         bucket minn maxn lrUpdateRate) + 1 × float64 (t)
  dict:  int32 size, int32 nwords, int32 nlabels, int64 ntokens,
         int64 pruneidx_size; per entry: NUL-terminated word bytes,
         int64 count, int8 type (0 = word, 1 = label); pruneidx pairs
         (int32, int32) × max(pruneidx_size, 0)
  int8   quant_  (0: dense input matrix follows)
  input: int64 rows, int64 cols, rows*cols float32 row-major
  int8   qout_
  output: same dense layout

Inference implemented (enough to run the reference's two dictionary
uses):
  * supervised predict: sentence vector = mean of input rows for known
    words (+ char-ngram bucket rows when minn > 0), label scores =
    softmax(output @ hidden), top-k labels.
  * nearest neighbors: cosine over word input vectors.

Quantized (.ftz) models and hierarchical-softmax prediction are out of
scope — the loader raises with a clear message rather than guessing.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

FASTTEXT_MAGIC = 793712314
FASTTEXT_VERSION = 12

#: model enum (src/args.h): cbow=1, sg=2, sup=3
MODEL_SUP = 3
#: loss enum: hs=1, ns=2, softmax=3, ova=4
LOSS_SOFTMAX = 3


def _fnv1a(s: str) -> int:
    """fastText's subword hash: FNV-1a over utf-8 bytes, 32-bit, with
    each byte SIGN-EXTENDED before the xor (dictionary.cc hashes
    ``uint32_t(int8_t(b))``), so bytes >= 0x80 xor as 0xFFFFFF80..FF —
    required for bucket rows to match real models on non-ASCII
    n-grams."""
    h = 2166136261
    for b in s.encode("utf-8"):
        if b >= 0x80:
            b -= 256
        h = (h ^ (b & 0xFFFFFFFF)) & 0xFFFFFFFF
        h = (h * 16777619) & 0xFFFFFFFF
    return h


@dataclass
class FastTextModel:
    dim: int
    bucket: int
    minn: int
    maxn: int
    word_ngrams: int
    model: int
    loss: int
    words: list  # entry order = input-matrix row order for word rows
    labels: list
    counts: list
    input: list  # rows: nwords + bucket, each a list[float]
    output: list  # rows: nlabels (sup) / nwords, each a list[float]

    # -- loading -------------------------------------------------------

    @classmethod
    def load(cls, path: str) -> "FastTextModel":
        with open(path, "rb") as fh:
            data = fh.read()
        off = 0

        def take(fmt: str):
            nonlocal off
            vals = struct.unpack_from("<" + fmt, data, off)
            off += struct.calcsize("<" + fmt)
            return vals if len(vals) > 1 else vals[0]

        magic = take("i")
        version = take("i")
        if magic != FASTTEXT_MAGIC:
            raise ValueError(
                f"not a fastText model (magic {magic}, "
                f"want {FASTTEXT_MAGIC})")
        if version > FASTTEXT_VERSION:
            raise ValueError(f"unsupported fastText version {version}")
        (dim, _ws, _epoch, _min_count, _neg, word_ngrams, loss, model,
         bucket, minn, maxn, _lr_update) = take("12i")
        take("d")  # sampling threshold t

        size, nwords, nlabels = take("3i")
        take("q")  # ntokens
        pruneidx_size = take("q")
        words, labels, counts = [], [], []
        for _ in range(size):
            end = data.index(b"\0", off)
            token = data[off:end].decode("utf-8")
            off = end + 1
            count = take("q")
            etype = take("b")
            counts.append(count)
            (labels if etype == 1 else words).append(token)
        for _ in range(max(pruneidx_size, 0)):
            take("2i")

        def matrix():
            nonlocal off
            quant = take("b")
            if quant:
                raise ValueError(
                    "quantized (.ftz) fastText models are not supported "
                    "by the pure-Python reader")
            rows, cols = take("2q")
            out = []
            for _ in range(rows):
                out.append(list(take(f"{cols}f")) if cols else [])
            return out

        inp = matrix()
        outp = matrix()
        return cls(dim=dim, bucket=bucket, minn=minn, maxn=maxn,
                   word_ngrams=word_ngrams, model=model, loss=loss,
                   words=words, labels=labels, counts=counts,
                   input=inp, output=outp)

    # -- shared vector plumbing ----------------------------------------

    def _word_id(self, w: str) -> int | None:
        try:
            return self.words.index(w)
        except ValueError:
            return None

    def _subword_rows(self, word: str) -> list[int]:
        """Char-ngram bucket rows for <word> (fastText wraps the token in
        angle brackets before extracting [minn, maxn]-grams)."""
        if self.minn <= 0:
            return []
        wrapped = f"<{word}>"
        rows = []
        n = len(wrapped)
        for start in range(n):
            for ln in range(self.minn, self.maxn + 1):
                if start + ln > n:
                    break
                ng = wrapped[start:start + ln]
                if ng == wrapped:
                    continue
                rows.append(len(self.words)
                            + _fnv1a(ng) % self.bucket)
        return rows

    def get_word_vector(self, word: str) -> list[float]:
        rows = []
        wid = self._word_id(word)
        if wid is not None:
            rows.append(wid)
        rows.extend(self._subword_rows(word))
        if not rows:
            return [0.0] * self.dim
        vec = [0.0] * self.dim
        for r in rows:
            row = self.input[r]
            for i in range(self.dim):
                vec[i] += row[i]
        return [v / len(rows) for v in vec]

    # -- the two reference dictionary uses ------------------------------

    def predict(self, text: str, k: int = 1) -> tuple[list, list]:
        """(labels, probs) — fastText's Python-API shape. Supervised
        softmax only (the reference's classification dictionaries are
        trained with the default loss)."""
        if self.model != MODEL_SUP:
            raise ValueError("predict() needs a supervised model")
        if self.loss != LOSS_SOFTMAX:
            raise ValueError(
                "only softmax-loss prediction is implemented")
        rows = []
        for tok in text.replace("\n", " ").split():
            wid = self._word_id(tok)
            if wid is not None:
                rows.append(wid)
            rows.extend(self._subword_rows(tok))
        if not rows:
            return [], []
        hidden = [0.0] * self.dim
        for r in rows:
            row = self.input[r]
            for i in range(self.dim):
                hidden[i] += row[i]
        hidden = [h / len(rows) for h in hidden]
        scores = [sum(o[i] * hidden[i] for i in range(self.dim))
                  for o in self.output]
        mx = max(scores)
        exps = [math.exp(s - mx) for s in scores]
        z = sum(exps)
        probs = [e / z for e in exps]
        order = sorted(range(len(probs)), key=lambda j: -probs[j])[:k]
        # labels are returned VERBATIM from the dictionary: real models
        # already store them with the __label__ prefix included (the
        # training corpus carries it), so prepending another here would
        # yield '__label____label__x' for genuinely-trained models.
        return ([self.labels[j] for j in order],
                [probs[j] for j in order])

    def get_nearest_neighbors(self, word: str,
                              k: int = 10) -> list[tuple[float, str]]:
        """[(cosine, word)] desc, the query word excluded — fastText's
        Python-API shape."""
        qv = self.get_word_vector(word)
        qn = math.sqrt(sum(x * x for x in qv)) or 1.0
        out = []
        for w in self.words:
            if w == word or w == "</s>":
                continue
            v = self.get_word_vector(w)
            vn = math.sqrt(sum(x * x for x in v)) or 1.0
            cos = sum(a * b for a, b in zip(qv, v)) / (qn * vn)
            out.append((cos, w))
        out.sort(key=lambda t: (-t[0], t[1]))
        return out[:k]


def write_model(path: str, dim: int, words: dict, labels: dict,
                input_rows: dict, output_rows: list,
                model: int = MODEL_SUP, loss: int = LOSS_SOFTMAX,
                bucket: int = 0, minn: int = 0, maxn: int = 0) -> None:
    """Write a VALID minimal ``.bin`` in the published layout (the test
    artifact generator — what `fasttext.train_supervised(...).save_model`
    would emit for a tiny corpus, with vectors chosen instead of
    trained). words/labels: {token: count}; input_rows: {token: vector}
    for word rows (bucket rows zero-filled); output_rows: one vector per
    label (sup) in label order. Label tokens are written WITH the
    __label__ prefix (added here when absent) because that is what real
    fastText dictionaries store — the training corpus includes it."""
    buf = bytearray()
    buf += struct.pack("<2i", FASTTEXT_MAGIC, FASTTEXT_VERSION)
    buf += struct.pack("<12i", dim, 5, 5, 1, 5, 1, loss, model,
                       bucket, minn, maxn, 100)
    buf += struct.pack("<d", 1e-4)

    entries = ([(w, c, 0) for w, c in words.items()]
               + [(lb if lb.startswith("__label__")
                   else f"__label__{lb}", c, 1)
                  for lb, c in labels.items()])
    buf += struct.pack("<3i", len(entries), len(words), len(labels))
    buf += struct.pack("<q", sum(c for _, c, _ in entries))
    buf += struct.pack("<q", 0)  # pruneidx_size
    for token, count, etype in entries:
        buf += token.encode("utf-8") + b"\0"
        buf += struct.pack("<qb", count, etype)

    def matrix(rows: list) -> bytes:
        out = struct.pack("<b", 0)  # not quantized
        out += struct.pack("<2q", len(rows), dim)
        for r in rows:
            out += struct.pack(f"<{dim}f", *r)
        return out

    in_rows = [input_rows[w] for w in words]
    in_rows += [[0.0] * dim for _ in range(bucket)]
    buf += matrix(in_rows)
    buf += matrix(output_rows)
    with open(path, "wb") as fh:
        fh.write(bytes(buf))
