from terrier_ray.extract.html import (  # noqa: F401
    extract_text_reference,
    HtmlExtractor,
)
