from blacklab_ray.analysis.analyzers import (
    tokenize_text, tokenize_column, normalize_text, strip_accents,
    STOPWORDS, STOPWORD_SET, TOKEN_RE,
)
