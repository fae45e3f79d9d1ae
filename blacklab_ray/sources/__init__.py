from blacklab_ray.sources.synth import (
    generate_pages, write_pages_corpus, pangram4_table, PANGRAM4,
)
