from terrier_ray.text.tokenize import tokenize, Tokenizer, TOKEN_RE  # noqa: F401
