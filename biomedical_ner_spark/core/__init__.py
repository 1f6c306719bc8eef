from .oracle import (  # noqa: F401
    MAX_CHAR_LEN,
    MAX_SEQ_LEN,
    extract_entities,
    predict_tags,
    run_reference_pipeline,
    tokenize_text,
)
