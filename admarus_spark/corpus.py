"""Deterministic synthetic corpora (FIXTURES.md §1-§2).

Two corpora, both seeded and reproducible with no external data:

- :func:`make_docs_corpus` — source-code-shaped table per BASELINE.json
  input_hint: (repo, path, commit, lang, content, content_sha256), with a
  Zipf head (one term in >= 50% of docs — the skew fixture), unique rare
  terms, sub-3-char tokens, mixed case, and >=100x doc-length spread.
- :func:`make_movies_corpus` — ports the reference's integration corpus
  shape (``kamilata/tests/common/movies.rs:3-31``): full_text = title +
  overview + genres, including the exact priority-test documents
  (``kamilata/tests/priorities.rs:11-26``) and a controlled subset
  containing the word ``hunger`` (``kamilata/tests/search.rs:57``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# ~120 code-flavored vocabulary words; index = Zipf rank.
_VOCAB = (
    "license import return function struct class public static void string "
    "value result error index buffer stream thread mutex atomic vector "
    "option match module crate package interface implements extends super "
    "select where group order limit join inner outer table column schema "
    "partition shuffle broadcast executor driver memory spill codegen "
    "parser lexer token grammar syntax semantic compiler linker assembler "
    "kernel syscall socket packet router gateway protocol session cookie "
    "request response header payload encode decode compress inflate "
    "deflate checksum digest cipher entropy random seeded deterministic "
    "iterator generator closure lambda functor monad applicative traverse "
    "foldable hashmap hashset btree skiplist bloom sketch minhash simhash "
    "posting inverted bm25 ranking retrieval relevance precision recall "
    "fscore tokenize normalize stemming unicode codepoint grapheme "
    "cluster replica quorum consensus leader follower heartbeat election "
    "snapshot journal writeahead rollback commit branch merge rebase"
).split()

_LANGS = ("python", "rust", "c", "go", "javascript")
_EXT = {"python": "py", "rust": "rs", "c": "c", "go": "go", "javascript": "js"}
_SEPARATORS = (" ", "\n", " ", "(", ")", ".", ",", "_", "::", " = ", "\t", "; ")
_SHORT_TOKENS = ("if", "a", "of", "x", "to", "in")  # dropped by len>=3 rule
_MIXED_CASE = ("Foo", "BAR", "CamelCase", "XMLHttpRequest", "TODO")


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def make_docs_corpus(n_docs: int = 1000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    n_repos = max(1, n_docs // 50)
    rows = []
    zipf_p = 1.0 / np.arange(1, len(_VOCAB) + 1) ** 1.1
    zipf_p /= zipf_p.sum()
    for i in range(n_docs):
        repo = f"org{i % 7}/proj{rng.randint(n_repos)}"
        lang = _LANGS[rng.randint(len(_LANGS))]
        path = f"src/mod{rng.randint(40)}/file{i:06d}.{_EXT[lang]}"
        commit = "".join(rng.choice(list("0123456789abcdef"), 40))
        # doc length spread >= 100x: 8 .. 1600 tokens
        n_tokens = int(8 * (200 ** rng.random_sample()))
        words = list(rng.choice(_VOCAB, size=n_tokens, p=zipf_p))
        # hot term in >= 50% of docs (skew fixture)
        if i % 2 == 0 or rng.random_sample() < 0.2:
            words.insert(0, "license")
        # unique rare term in ~5% of docs
        if i % 20 == 3:
            words.append(f"rareterm{i:06d}z")
        # tokenizer-drop cases + mixed case
        for _ in range(rng.randint(0, 4)):
            words.insert(rng.randint(len(words)), _SHORT_TOKENS[rng.randint(len(_SHORT_TOKENS))])
        if rng.random_sample() < 0.5:
            words.insert(rng.randint(len(words)), _MIXED_CASE[rng.randint(len(_MIXED_CASE))])
        if rng.random_sample() < 0.3:
            words.append(str(100 + rng.randint(900)))  # numeric token (kept, len>=3)
        seps = rng.choice(_SEPARATORS, size=len(words))
        content = "".join(w + s for w, s in zip(words, seps))
        rows.append((repo, path, commit, lang, content, sha256_hex(content)))
    return pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content", "content_sha256"]
    )


def make_bench_corpus(
    n_docs: int = 30000, seed: int = 13, vocab_size: int | None = None
) -> pd.DataFrame:
    """Fully vectorized corpus generator for throughput benchmarks: Zipf
    token stream split into docs with ~40x length spread. Same schema as
    make_docs_corpus; contents are single-space-joined (tokenizer-equivalent).

    ``vocab_size=None`` keeps the legacy 120-word vocabulary (every term
    hot — a degenerate dictionary that hides per-term build costs).
    With ``vocab_size=V`` the 120 code words head a Zipf(1.2) distribution
    and synthetic identifiers fill ranks 120..V — the realistic
    source-code shape (Heaps-law dictionary growth, most terms rare),
    which is the regime the 100 TB build actually runs in and the one the
    scaling ladder measures."""
    rng = np.random.RandomState(seed)
    lens = (40 * (40 ** rng.random_sample(n_docs))).astype(np.int64)  # 40..1600
    total = int(lens.sum())
    if vocab_size is None:
        zipf_p = 1.0 / np.arange(1, len(_VOCAB) + 1) ** 1.05
        zipf_p /= zipf_p.sum()
        vocab = np.array(_VOCAB, dtype=object)
        stream = vocab[rng.choice(len(_VOCAB), size=total, p=zipf_p)]
    else:
        ranks = np.minimum(rng.zipf(1.2, size=total), vocab_size) - 1
        vocab = np.empty(vocab_size, dtype=object)
        nb = min(len(_VOCAB), vocab_size)
        vocab[:nb] = _VOCAB[:nb]
        if vocab_size > nb:
            vocab[nb:] = np.char.add(
                "ident", np.arange(nb, vocab_size).astype(str)
            ).astype(object)
        stream = vocab[ranks]
    bounds = np.cumsum(lens)[:-1]
    docs = np.split(stream, bounds)
    contents = [" ".join(d) for d in docs]
    langs = np.array(_LANGS, dtype=object)[rng.randint(0, len(_LANGS), n_docs)]
    pdf = pd.DataFrame(
        {
            "repo": [f"org{i % 23}/proj{i % 211}" for i in range(n_docs)],
            "path": [f"src/file{i:08d}.py" for i in range(n_docs)],
            "commit": [f"{i:040x}" for i in range(n_docs)],
            "lang": langs,
            "content": contents,
        }
    )
    pdf["content_sha256"] = pdf["content"].map(sha256_hex)
    return pdf


# Exact priority-test documents, verbatim from kamilata/tests/priorities.rs:11-26.
_PRIORITY_DOCS = (
    ("Perfect match", "This is the perfectly matching document"),
    ("Partial match", "This is the partially matching document"),
)

_GENRES = ("drama", "comedy", "action", "thriller", "documentary", "scifi")
_TITLE_WORDS = (
    "games catching fire mockingjay silence winter night return shadow "
    "empire broken crown legacy storm river golden city lost kingdom"
).split()
_OVERVIEW_WORDS = (
    "story of survival districts rebellion arena tribute president capital "
    "revolution spark hope betrayal alliance victory defeat journey family "
    "secret power destiny sacrifice courage darkness light battle"
).split()


def make_movies_corpus(n_movies: int = 200, seed: int = 7) -> pd.DataFrame:
    """Movies-shaped table mapped into the docs shape (FIXTURES.md §2):
    repo='movies', path='movie/<id padded>', content = title + overview +
    genres (the reference's full_text, movies.rs:13-31)."""
    rng = np.random.RandomState(seed)
    rows = []
    for mid in range(n_movies):
        if mid < len(_PRIORITY_DOCS):
            title, overview = _PRIORITY_DOCS[mid]
            genres = ["drama"]
        else:
            nt = 2 + rng.randint(3)
            title_words = list(rng.choice(_TITLE_WORDS, size=nt))
            # 'hunger' appears in a controlled ~15% subset (recall fixture)
            if mid % 7 == 3:
                title_words.insert(0, "hunger")
            title = " ".join(title_words)
            overview = " ".join(rng.choice(_OVERVIEW_WORDS, size=8 + rng.randint(25)))
            if mid % 11 == 5:
                overview += " hunger strike"
            genres = list(rng.choice(_GENRES, size=1 + rng.randint(2)))
        content = f"{title} {overview} {' '.join(genres)}"
        rows.append(
            (
                "movies",
                f"movie/{mid:06d}",
                sha256_hex(f"movie-{mid}")[:40],
                "en",
                content,
                sha256_hex(content),
            )
        )
    return pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content", "content_sha256"]
    )


def testdata_documents_as_docs(pdf: pd.DataFrame) -> pd.DataFrame:
    """Map the driver's testdata ``documents`` table (doc_id, text, lang,
    source, n_chars) into the engine's docs shape. path embeds the original
    doc_id zero-padded so that lexicographic (repo, path) rank == doc_id."""
    out = pd.DataFrame(
        {
            "repo": pdf["source"].astype(str),
            "path": pdf["doc_id"].map(lambda i: f"doc/{i:010d}"),
            "commit": pdf["doc_id"].map(lambda i: sha256_hex(str(i))[:40]),
            "lang": pdf["lang"].astype(str),
            "content": pdf["text"].astype(str),
        }
    )
    out["content_sha256"] = out["content"].map(sha256_hex)
    return out
