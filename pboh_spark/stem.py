"""Porter stemming + stemmed-trigram string similarity (F4 + the F6
trigram variant), exact reference parity.

Mirrors context/PorterStemmer.scala:12-97 RULE FOR RULE — including
three places where that implementation deviates from canonical Porter
(the parity target is the reference's behavior, not the 1980 paper):

* 1b branch order (:19-33): the ``(*v*)ed / (*v*)ing`` test runs BEFORE
  the ``(m>0) eed → ee`` rule, so e.g. feed → fe and agreed → agre
  (canonical keeps feed / agree).
* rule fall-through (:202-206): within a step, a rule whose suffix
  matches but whose condition fails falls through to the NEXT rule
  (canonical stops at the longest matching suffix).
* the *o (cvc) test (:183-188) checks the w/x/y exclusion at the VOWEL
  position (length−2), not the final consonant — so mixing → mixe
  (canonical: mix).

Consonant test (:168-173): aeiou are vowels; 'y' is a vowel when the
NEXT position holds a consonant, else a consonant.

``stem_trigram_similarity`` is index/MentionEntitiesFrequencyIndex
.scala:82-119 — char trigrams of the two stems plus the ``$$$ab`` /
``yz###`` boundary trigrams, counted with the reference's exact
asymmetric loop: a SET of the first stem's trigrams, every OCCURRENCE
of the second stem's trigrams tested against it (repeats in the second
stem multi-count, so the value can exceed 1.0 and sim(a,b) ≠ sim(b,a)
in general — both behaviors pinned by tests). 0.0 when neither stem
yields a trigram (the reference computes NaN there).

Spark surface: Arrow-batched pandas UDFs (never per-row Python) — a
scalar string→string ``stem_udf`` and the pairwise similarity UDF used
by the ``link_stem_trigram`` contract query.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves the deferred
#                      'pd.Series' annotation strings in module globals

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    """PorterStemmer.scala:168-173 (out-of-range positions are not
    consonants, which also terminates the 'y' recursion)."""
    if i < 0 or i >= len(w):
        return False
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y" and _is_cons(w, i + 1):
        return False
    return True


def _measure(w: str) -> int:
    """Number of vowel→consonant transitions = m of [C](VC)^m[V] (:195)."""
    return sum(
        1 for i in range(len(w)) if not _is_cons(w, i) and _is_cons(w, i + 1)
    )


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_cc(w: str) -> bool:
    return len(w) > 1 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    # the w/x/y exclusion sits at length-2 (the vowel slot) — :183-188,
    # a documented deviation from canonical Porter
    return (
        len(w) > 2
        and _is_cons(w, len(w) - 1)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 3)
        and w[-2] not in "wxy"
    )


def _replace(w: str, rules) -> str:
    """First rule whose suffix matches AND whose condition holds on the
    trimmed stem wins; a failed condition FALLS THROUGH (:202-206).
    rules: (condition(stem)->bool | None, suffix, replacement) where
    replacement is a string to append or a callable(stem)->str."""
    for cond, suf, rep in rules:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)] if suf else w
            if cond is None or cond(stem):
                return rep(stem) if callable(rep) else stem + rep
    return w


def porter_stem(word: str) -> str:
    """context/PorterStemmer.scala:12-97, rule lists verbatim."""
    w = word.lower()
    # step 1a (:14-18)
    w = _replace(w, [
        (None, "sses", "ss"), (None, "ies", "i"),
        (None, "ss", "ss"), (None, "s", ""),
    ])
    # step 1b (:20-33) — reference branch order, see module docstring
    if (w.endswith("ed") and _has_vowel(w[:-2])) or (
        w.endswith("ing") and _has_vowel(w[:-3])
    ):
        w = _replace(w, [(_has_vowel, "ed", ""), (_has_vowel, "ing", "")])
        w = _replace(w, [
            (None, "at", "ate"), (None, "bl", "ble"), (None, "iz", "ize"),
            (lambda s: _ends_cc(s) and s[-1] not in "lsz", "",
             lambda s: s[:-1]),
            (lambda s: _measure(s) == 1 and _ends_cvc(s), "", "e"),
        ])
    else:
        w = _replace(w, [(lambda s: _measure(s) > 0, "eed", "ee")])
    # step 1c (:35)
    w = _replace(w, [(_has_vowel, "y", "i")])
    m0 = lambda s: _measure(s) > 0  # noqa: E731
    m1 = lambda s: _measure(s) > 1  # noqa: E731
    # step 2 (:38-58)
    w = _replace(w, [(m0, a, b) for a, b in [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    ]])
    # step 3 (:60-67)
    w = _replace(w, [(m0, a, b) for a, b in [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]])
    # step 4 (:69-88) — "ion" additionally requires the stem to end s/t
    w = _replace(w, [(m1, a, "") for a in [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
        "ement", "ment", "ent",
    ]] + [
        (lambda s: _measure(s) > 1 and s[-1:] in ("s", "t"), "ion", ""),
    ] + [(m1, a, "") for a in [
        "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]])
    # step 5a (:91-92)
    w = _replace(w, [
        (m1, "e", ""),
        (lambda s: _measure(s) == 1 and not _ends_cvc(s), "e", ""),
    ])
    # step 5b (:94)
    w = _replace(w, [(
        lambda s: _measure(s) > 1 and _ends_cc(s) and s.endswith("l"),
        "", lambda s: s[:-1],
    )])
    return w


def _trigrams(a: str) -> set[str]:
    t = {a[i - 2: i + 1] for i in range(2, len(a))}
    if len(a) >= 2:
        t.add("$$$" + a[0] + a[1])
        t.add(a[-2] + a[-1] + "###")
    return t


def stem_trigram_similarity(aa: str, bb: str) -> float:
    """MentionEntitiesFrequencyIndex.scala:82-119: trigram similarity over
    the Porter-stemmed strings, with the reference's boundary trigrams —
    replicating its exact (asymmetric, occurrence-counted) loop. The first
    string contributes a SET of trigrams; every trigram OCCURRENCE of the
    second string is then tested against that set, so a repeated trigram
    in ``bb``'s stem counts once per position in both the intersection and
    the union. Consequences preserved from the reference: the function is
    not symmetric, and it can exceed 1.0 (stem 'banana' vs itself → 6/5).
    Too-short pair (no trigrams on either side) → 0.0 where the reference
    computes 0.0/0 (NaN); NaN would poison downstream comparisons, so the
    zero-trigram case is the one deliberate deviation."""
    a = porter_stem(aa)
    b = porter_stem(bb)
    ta = _trigrams(a)
    inter = 0
    union = len(ta)
    for i in range(2, len(b)):
        if b[i - 2: i + 1] in ta:
            inter += 1
        else:
            union += 1
    if len(b) >= 2:
        if "$$$" + b[0] + b[1] in ta:
            inter += 1
        else:
            union += 1
        if b[-2] + b[-1] + "###" in ta:
            inter += 1
        else:
            union += 1
    if union == 0:
        return 0.0
    return inter / union


def stem_udf():
    """Arrow-batched string→string Porter stem column function."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(lambda x: None if x is None else porter_stem(x))

    return _stem


def stem_tokens_udf():
    """Arrow-batched array<string>→array<string> per-token Porter stem —
    the TextSplittingInWords.scala:39 hook (the reference stems every
    context word before the word-frequency dictionary lookup). Compose
    in front of context.word_freq / context_windows for stemmed context
    statistics: ``df.withColumn("tokens", stem_tokens_udf()("tokens"))``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _stem_arr(s: pd.Series) -> pd.Series:
        return s.map(
            lambda arr: None
            if arr is None
            else [None if x is None else porter_stem(x) for x in arr]
        )

    return _stem_arr


def stem_trigram_sim_udf():
    """Arrow-batched (string, string)→double stemmed-trigram similarity."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _sim(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([
            None if (x is None or y is None)
            else stem_trigram_similarity(x, y)
            for x, y in zip(a, b)
        ], dtype="float64")

    return _sim
