from terrier_ray.datagen.webtext import (  # noqa: F401
    generate_webtext_parquet,
    generate_queries,
    webtext_for_sf,
    WEBTEXT_SCHEMA,
)
