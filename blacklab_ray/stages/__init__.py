from blacklab_ray.stages.extract import HtmlExtractor, extract_text
from blacklab_ray.stages.tokenize import TokenizeForwardIndex, hash64
