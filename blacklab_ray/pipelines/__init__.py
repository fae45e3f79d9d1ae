from blacklab_ray.pipelines import (
    ann, cleaning, dedup, frequency, hits, multimodal, textstats, windows,
)
