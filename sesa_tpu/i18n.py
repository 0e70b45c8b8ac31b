"""Locale auto-detection + JSON string tables (11 languages).

Functional parity with reference assets/i18n/i18n.py:10-54; translation
tables are carried as data under sesa_tpu/assets/i18n/languages (repaired
to valid JSON — two upstream files had syntax errors).
"""

from __future__ import annotations

import json
import os
from locale import getdefaultlocale
from pathlib import Path

_HERE = os.path.dirname(os.path.abspath(__file__))
LANGUAGE_PATH = os.path.join(_HERE, "assets", "i18n", "languages")
APP_CONFIG_PATH = os.path.join(_HERE, "assets", "config.json")


class I18nAuto:
    def __init__(self, language: str | None = None):
        override = False
        lang_prefix = "auto"
        try:
            with open(APP_CONFIG_PATH, encoding="utf8") as f:
                lang_config = json.load(f).get("lang", {})
            override = lang_config.get("override", False)
            lang_prefix = lang_config.get("selected_lang", "auto")
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            pass

        self.language = lang_prefix
        if not override:
            try:
                language = language or (getdefaultlocale()[0] or "en_US")
            except Exception:
                language = "en_US"
            prefix = language[:2].lower() if language else "en"
            available = self.available_languages()
            matching = [l for l in available if l.startswith(prefix)]
            self.language = matching[0] if matching else "en_us"

        self.language_map = self._load(self.language)

    @staticmethod
    def available_languages():
        return sorted(p.stem for p in Path(LANGUAGE_PATH).glob("*.json"))

    @staticmethod
    def _load(language: str) -> dict:
        path = Path(LANGUAGE_PATH) / f"{language}.json"
        if not path.exists():
            path = Path(LANGUAGE_PATH) / "en_us.json"
        with open(path, encoding="utf-8") as f:
            return json.load(f)

    def __call__(self, key: str) -> str:
        return self.language_map.get(key, key)
