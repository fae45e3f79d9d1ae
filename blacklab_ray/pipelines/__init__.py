from blacklab_ray.pipelines import (
    ann, cleaning, curate, dedup, frequency, hits, multimodal, textstats,
    windows,
)
