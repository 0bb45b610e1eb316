from clipx.text.tokenizer import ClipTokenizer, tokenize  # noqa: F401
