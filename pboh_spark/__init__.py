"""pboh_spark — a from-scratch PySpark-native record-linkage engine.

Re-expresses the capabilities of dalab/pboh-entity-linking (the PBOH
probabilistic bag-of-hyperlinks entity linker, WWW'16) as an idiomatic
Spark pipeline over multi-turn conversation transcripts:

    transcripts → normalize (stage 1) → name/entity statistics (stage 2)
    → blocking (stage 3) → pair scoring (stage 4) → max-product resolve
    (stage 5) → connected-components clustering (stage 6) → evaluation.

Every stage is declared with the DataFrame API so Catalyst plans the
physical execution; Python appears only in Arrow-vectorized pandas UDFs
(minhash signatures, Jaro-Winkler batches, the per-conversation LBP
kernel). No per-row Python UDFs anywhere.

Reference parity is documented per-module with file:line citations into
/root/reference/src/main/scala/.
"""

__version__ = "0.1.0"
