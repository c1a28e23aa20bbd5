"""Train the tiny REAL fastText-format language-ID model shipped at
serenedb_spark/analysis/models/langid_tiny.bin.

fastText's supervised model (Joulin et al. 2016, "Bag of Tricks for
Efficient Text Classification" — public paper) is a softmax linear
classifier over the AVERAGE of trainable word vectors. This script
trains exactly that objective with plain numpy SGD on a curated corpus
of common function words per language (public linguistic knowledge),
then serializes the weights in fastText's published .bin layout via
functions/fasttext_io.write_model — so the shipped artifact is a real
trained model executed by the same reader the reference's
classification tokenizer seam uses (create_tsdictionary.cpp:535
model_location).

Run offline (deterministic, seed 7):
    python scripts/train_langid_model.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: common function words per language — public-knowledge stopword cores
CORPUS = {
    "en": "the of and to in is was for that with as his on are by he at "
          "from it an be this which or had were but not have one all "
          "she there their when who will more would what about said",
    "de": "der die das und ist von den mit nicht ein eine auf auch als "
          "sich des dem er im nach bei einer war um aus zum sind noch "
          "wie einem über nur oder aber vor zur bis mehr durch man",
    "fr": "le la les de des et est un une dans que qui pour sur pas au "
          "plus par avec son ne se ce il aux ou sont cette mais comme "
          "ses être fait tout nous leur bien sans peut deux même",
    "es": "el la los las de en que por un una con para es del se no al "
          "su lo como más pero sus le ha me si sin sobre este ya entre "
          "cuando todo esta ser son dos también fue había era muy",
    "it": "il la di che e un una per in con non sono da dei come io si "
          "lo ma le se anche più nel alla questo hanno essere sulla "
          "della gli dal molto tutti questa quando fatto essere stato",
    "ru": "и в не на я что он с как это по но они мы все она так его "
          "же от за то бы ее мне было вот только еще или них до вас "
          "нибудь уже вам сказал себя может них них тогда чем",
}

DIM = 16
EPOCHS = 600
LR = 0.5
SEED = 7


def main() -> None:
    rng = np.random.default_rng(SEED)
    labels = sorted(CORPUS)
    vocab: list[str] = []
    word_label: list[tuple[list[int], int]] = []   # docs: (word ids, y)
    w2i: dict[str, int] = {}
    for y, lang in enumerate(labels):
        words = CORPUS[lang].split()
        ids = []
        for w in words:
            if w not in w2i:
                w2i[w] = len(vocab)
                vocab.append(w)
            ids.append(w2i[w])
        # training docs: sliding 5-word windows over the word list
        for k in range(len(ids) - 4):
            word_label.append((ids[k:k + 5], y))
        word_label.append((ids, y))

    V, C = len(vocab), len(labels)
    emb = rng.normal(0, 0.1, size=(V, DIM))
    out = np.zeros((C, DIM))

    idx = np.arange(len(word_label))
    for ep in range(EPOCHS):
        rng.shuffle(idx)
        for i in idx:
            ids, y = word_label[i]
            h = emb[ids].mean(axis=0)
            z = out @ h
            z -= z.max()
            p = np.exp(z)
            p /= p.sum()
            g = p.copy()
            g[y] -= 1.0
            # dL/dout = g ⊗ h ; dL/dh = outᵀ g
            gh = out.T @ g
            out -= LR * np.outer(g, h)
            emb[ids] -= LR * gh / len(ids)
        if ep % 100 == 0:
            correct = 0
            for ids, y in word_label:
                h = emb[ids].mean(axis=0)
                if int(np.argmax(out @ h)) == y:
                    correct += 1
            print(f"epoch {ep}: train acc "
                  f"{correct / len(word_label):.3f}")

    from serenedb_spark.functions import fasttext_io as FT

    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "serenedb_spark", "analysis", "models", "langid_tiny.bin")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    FT.write_model(
        dest, dim=DIM,
        words={w: 1 for w in vocab},
        labels={lang: 1 for lang in labels},
        input_rows={w: [float(x) for x in emb[w2i[w]]] for w in vocab},
        output_rows=[[float(x) for x in row] for row in out],
    )
    print(f"wrote {dest} ({os.path.getsize(dest)} bytes, "
          f"{V} words, {C} labels, dim {DIM})")


if __name__ == "__main__":
    main()
