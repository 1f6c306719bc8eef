"""Golden fixtures from the reference's own test set (JNLPBA.ipynb cc[61],
duplicated BioWordVec.ipynb cc[21]); see FIXTURES.md §3."""

GOLDEN = [
    (
        "Octamer-binding proteins from HeLa cells stimulate transcription",
        ["B-protein", "I-protein", "O", "B-cell_line", "I-cell_line", "O", "O"],
    ),
    (
        "The BRCA1 gene is associated with breast cancer",
        ["O", "B-DNA", "O", "O", "O", "O", "B-cell_type", "O"],
    ),
    (
        "mRNA expression in Jurkat cells was upregulated",
        ["B-RNA", "O", "O", "B-cell_line", "I-cell_line", "O", "O"],
    ),
    (
        "T lymphocytes play a key role in immune response",
        ["B-cell_type", "I-cell_type", "O", "O", "O", "O", "O", "O", "O"],
    ),
    (
        "p53 and BRCA1 regulate DNA replication",
        ["B-protein", "O", "B-DNA", "O", "B-DNA", "O"],
    ),
    (
        "The RNA of Jurkat T cells is similar to HeLa cells",
        [
            "O", "B-RNA", "O", "B-cell_line", "B-cell_type", "I-cell_line",
            "O", "O", "O", "B-cell_line", "I-cell_line",
        ],
    ),
    (
        "p53 protein binds to BRCA1 DNA in HeLa and Jurkat cells during transcription",
        [
            "B-protein", "I-protein", "O", "O", "B-DNA", "I-DNA", "O",
            "B-cell_line", "O", "B-cell_line", "I-cell_line", "O", "O",
        ],
    ),
    (
        "BRCA1 gene transcribes mRNA which produces p53 protein",
        ["B-DNA", "O", "O", "B-RNA", "O", "O", "B-protein", "I-protein"],
    ),
]
