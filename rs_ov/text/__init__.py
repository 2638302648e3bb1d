from rs_ov.text.tokenizer import SimpleTokenizer, tokenize  # noqa: F401
from rs_ov.text.encoder import text_forward  # noqa: F401
from rs_ov.text.classifier import build_text_classifier  # noqa: F401
from rs_ov.text import templates  # noqa: F401
