from grenad_spark.functions.tokenize import (  # noqa: F401
    TOKEN_SPLIT_RE,
    tokens_col,
    terms,
    term_doc_tf,
    sql_tokens_cte,
)
