"""Gradio web UI: the 7-tab interface.

Functional parity with reference gui.py:87-1548 — tabs for Audio
Separation, Auto Ensemble, Download Sources, Manual Ensemble, Phase Fixer,
Batch Processing, and Custom Models, with favorites (⭐), presets, model
category dropdowns, Apollo/Matchering options, and HTML progress bars.
(The reference's Batch Processing tab is a stub that never processes —
gui.py:1139-1180; this one actually iterates the folder.)

gradio is an optional dependency: importing this module works without it,
``create_interface`` raises a clear error.
"""

from __future__ import annotations

import html
import os
from typing import List

from sesa_tpu import config_manager as cm
from sesa_tpu import helpers, processing
from sesa_tpu.i18n import I18nAuto
from sesa_tpu.postprocess.ensemble import ENSEMBLE_METHODS
from sesa_tpu.postprocess.phase_fixer import SOURCE_MODELS, TARGET_MODELS, process_phase_fix

try:
    import gradio as gr

    GRADIO_AVAILABLE = True
except ImportError:
    gr = None
    GRADIO_AVAILABLE = False

i18n = I18nAuto()

CSS = """
#header { text-align: center; }
.progress-bar { height: 18px; border-radius: 9px; background: #2d2d44; }
.progress-fill { height: 100%; border-radius: 9px;
  background: linear-gradient(90deg, #6366f1, #a855f7); }
"""


def progress_html(pct: int, label: str = "") -> str:
    pct = max(0, min(100, int(pct)))
    # status text can carry exception reprs ('<class ...>'): escape it so
    # metacharacters can't corrupt the rendered HTML
    return (
        f'<div class="progress-bar"><div class="progress-fill" '
        f'style="width:{pct}%"></div></div><p>{html.escape(label)} {pct}%</p>'
    )


# All 16 output stem slots, in display order (reference gui.py:523-552
# renders one gr.Audio per slot; processing.py fills the same 16 keys).
STEM_LABELS = [
    ("vocals", "Vocals"), ("instrumental", "Instrumental"),
    ("phaseremix", "Phase Remix"), ("drum", "Drums"),
    ("bass", "Bass"), ("other", "Other"),
    ("effects", "Effects"), ("speech", "Speech"),
    ("music", "Music"), ("dry", "Dry"),
    ("male", "Male"), ("female", "Female"),
    ("bleed", "Bleed"), ("karaoke", "Karaoke"),
    ("mid", "Mid"), ("side", "Side"),
]


def slot_outputs(upd: dict) -> List:
    """Map a processing.process_audio update onto the 16 stem outputs, in
    STEM_LABELS order (keys match processing.STEM_SLOTS)."""
    slots = upd.get("slots", {}) or {}
    return [slots.get(name) for name, _ in STEM_LABELS]


def batch_process_folder(folder, model, chunk_size, overlap, export_format,
                         process_fn=None):
    """Process every audio file in a folder; returns (status, output paths).

    One corrupt file must not abort the batch or discard the outputs of
    files already processed — and a file whose processing yields NO updates
    is reported as failed, not crashed (the reference's Batch tab never
    processes at all, gui.py:1139-1180)."""
    if not folder or not os.path.isdir(folder):
        return "Folder not found", []
    process_fn = process_fn or processing.process_audio
    outs = []
    failed = []
    files = sorted(
        f for f in os.listdir(folder)
        if f.lower().endswith((".wav", ".flac", ".mp3", ".ogg"))
    )
    for name in files:
        upd = None
        try:
            for upd in process_fn(
                os.path.join(folder, name), model, int(chunk_size),
                int(overlap), export_format,
            ):
                pass
            if upd is None:
                raise RuntimeError("no progress updates yielded")
            outs.extend(upd.get("outputs", []))
        except Exception as e:
            failed.append(f"{name} ({e})")
    status = f"Processed {len(files) - len(failed)}/{len(files)} files"
    if failed:
        status += "; failed: " + ", ".join(failed[:5])
    return status, outs


def _model_choices(category: str, favorites: List[str]) -> List[str]:
    from sesa_tpu.registry import get_all_model_configs_with_custom

    configs = get_all_model_configs_with_custom()
    names = list(configs.get(category, {}))
    return [f"{n} ⭐" if n in favorites else n for n in names]


def _categories() -> List[str]:
    from sesa_tpu.registry import get_all_model_configs_with_custom

    return list(get_all_model_configs_with_custom())


def create_interface():
    """Build the Blocks app (reference gui.py:87)."""
    if not GRADIO_AVAILABLE:
        raise RuntimeError(
            "The web UI requires the optional 'gradio' package; install it or "
            "use the CLI (python -m sesa_tpu.cli)."
        )

    config = cm.load_config()
    favorites = config["favorites"]
    settings = config["settings"]

    def run_process(audio_path, model, chunk_size, overlap, export_format,
                    use_tta, phaseremix, extract_inst, use_apollo,
                    apollo_chunk, apollo_over, apollo_method, apollo_normal,
                    apollo_mid, use_match, match_passes):
        outputs_final = [None] * len(STEM_LABELS)
        html = progress_html(0, "starting")
        for upd in processing.process_audio(
            audio_path, model, int(chunk_size), int(overlap), export_format,
            use_tta=use_tta, demud_phaseremix_inst=phaseremix,
            extract_instrumental=extract_inst, use_apollo=use_apollo,
            apollo_chunk_size=apollo_chunk, apollo_overlap=apollo_over,
            apollo_method=apollo_method, apollo_normal_model=apollo_normal,
            apollo_midside_model=apollo_mid, use_matchering=use_match,
            matchering_passes=int(match_passes),
        ):
            html = progress_html(upd["progress"], upd["status"])
            outputs_final = slot_outputs(upd)
            yield [html] + outputs_final

    def run_auto_ensemble(audio_path, models, chunk_size, overlap, etype,
                          export_format, use_tta, extract_inst):
        html = progress_html(0, "starting")
        out = None
        for upd in processing.auto_ensemble_process(
            audio_path, [m for m in (models or [])], int(chunk_size),
            int(overlap), export_format, use_tta=use_tta,
            extract_instrumental=extract_inst, ensemble_type=etype,
        ):
            html = progress_html(upd["progress"], upd["status"])
            out = upd["outputs"][0] if upd.get("outputs") else None
            yield html, out

    def run_manual_ensemble(files, method, weights):
        out = None
        html = progress_html(0, "starting")
        paths = [f.name if hasattr(f, "name") else f for f in (files or [])]
        for upd in processing.ensemble_audio_fn(paths, method, weights):
            html = progress_html(upd["progress"], upd["status"])
            out = upd["outputs"][0] if upd.get("outputs") else None
        return html, out

    def run_download(url):
        from sesa_tpu.download import download_callback

        path, status = download_callback(url)
        return status, path

    def run_phase_fix(source_file, target_file, low, high, scale):
        src = source_file.name if hasattr(source_file, "name") else source_file
        tgt = target_file.name if hasattr(target_file, "name") else target_file
        out, msg = process_phase_fix(src, tgt, helpers.OUTPUT_DIR,
                                     low_cutoff=low, high_cutoff=high,
                                     scale_factor=scale)
        return msg, out

    def run_batch(folder, model, chunk_size, overlap, export_format):
        return batch_process_folder(folder, model, chunk_size, overlap,
                                    export_format)

    def add_custom(name, mtype, ckpt_url, cfg_url):
        from sesa_tpu.registry import add_custom_model

        ok, msg = add_custom_model(name, mtype or "auto", ckpt_url, cfg_url)
        return msg

    def toggle_favorite(model, add):
        nonlocal favorites
        favorites = cm.update_favorites(favorites, cm.clean_model(model), add=add)
        cm.save_config(favorites, settings, config["presets"])
        return f"Favorites: {favorites}"

    with gr.Blocks(css=CSS, title="SESA TPU Audio Separation") as app:
        gr.Markdown("# SESA TPU — Audio Source Separation", elem_id="header")

        with gr.Tab(i18n("audio_separation_tab") if callable(i18n) else "Audio Separation"):
            with gr.Row():
                with gr.Column():
                    input_audio = gr.Audio(type="filepath", label="Input audio")
                    category = gr.Dropdown(choices=_categories(),
                                           value=settings.get("model_category", "Vocal Models"),
                                           label="Category")
                    model = gr.Dropdown(
                        choices=_model_choices(settings.get("model_category", "Vocal Models"), favorites),
                        label="Model")
                    category.change(
                        lambda c: gr.update(choices=_model_choices(c, favorites)),
                        category, model)
                    with gr.Row():
                        fav_add = gr.Button("⭐ Add favorite")
                        fav_rm = gr.Button("Remove favorite")
                    fav_status = gr.Markdown()
                    fav_add.click(lambda m: toggle_favorite(m, True), model, fav_status)
                    fav_rm.click(lambda m: toggle_favorite(m, False), model, fav_status)

                    chunk_size = gr.Number(value=settings["chunk_size"], label="Chunk size")
                    overlap = gr.Slider(2, 50, value=settings["overlap"], step=1, label="Overlap")
                    export_format = gr.Dropdown(
                        ["wav FLOAT", "flac PCM_16", "flac PCM_24"],
                        value=settings["export_format"], label="Export format")
                    use_tta = gr.Checkbox(value=settings["use_tta"], label="Use TTA")
                    phaseremix = gr.Checkbox(value=settings["use_demud_phaseremix_inst"],
                                             label="Phaseremix instrumental")
                    extract_inst = gr.Checkbox(value=settings["extract_instrumental"],
                                               label="Extract instrumental")
                    with gr.Accordion("Apollo enhancement", open=False):
                        use_apollo = gr.Checkbox(value=settings["use_apollo"], label="Use Apollo")
                        apollo_chunk = gr.Slider(3, 25, value=settings["apollo_chunk_size"],
                                                 step=1, label="Apollo chunk (s)")
                        apollo_over = gr.Slider(2, 10, value=settings["apollo_overlap"],
                                                step=1, label="Apollo overlap")
                        apollo_method = gr.Radio(["normal_method", "mid_side_method"],
                                                 value=settings["apollo_method"],
                                                 label="Method")
                        from sesa_tpu.apollo_processing import APOLLO_MODELS

                        apollo_normal = gr.Dropdown(
                            list(APOLLO_MODELS),
                            value=settings["apollo_normal_model"], label="Apollo model")
                        apollo_mid = gr.Dropdown(
                            list(APOLLO_MODELS),
                            value=settings["apollo_midside_model"], label="Mid/side model")
                    with gr.Accordion("Matchering mastering", open=False):
                        use_match = gr.Checkbox(value=settings["use_matchering"],
                                                label="Use Matchering")
                        match_passes = gr.Slider(1, 5, value=settings["matchering_passes"],
                                                 step=1, label="Passes")
                    process_btn = gr.Button("Process", variant="primary")
                with gr.Column():
                    progress = gr.HTML(progress_html(0))
                    # all 16 stem slots (reference gui.py:523-552), two per
                    # row; models only fill the slots they produce, the rest
                    # stay empty
                    stem_audios = []
                    for i in range(0, len(STEM_LABELS), 2):
                        with gr.Row():
                            for _, label in STEM_LABELS[i:i + 2]:
                                stem_audios.append(gr.Audio(label=label))
            process_btn.click(
                run_process,
                [input_audio, model, chunk_size, overlap, export_format, use_tta,
                 phaseremix, extract_inst, use_apollo, apollo_chunk, apollo_over,
                 apollo_method, apollo_normal, apollo_mid, use_match, match_passes],
                [progress] + stem_audios,
            )

        with gr.Tab("Auto Ensemble"):
            with gr.Row():
                with gr.Column():
                    ae_audio = gr.Audio(type="filepath", label="Input audio")
                    ae_category = gr.Dropdown(choices=_categories(),
                                              value="Vocal Models", label="Category")
                    ae_models = gr.CheckboxGroup(
                        choices=_model_choices("Vocal Models", favorites),
                        label="Models")
                    ae_category.change(
                        lambda c: gr.update(choices=_model_choices(c, favorites)),
                        ae_category, ae_models)
                    ae_type = gr.Dropdown(list(ENSEMBLE_METHODS), value="avg_wave",
                                          label="Ensemble method")
                    ae_chunk = gr.Number(value=settings["chunk_size"], label="Chunk size")
                    ae_overlap = gr.Slider(2, 50, value=settings["overlap"], step=1,
                                           label="Overlap")
                    ae_format = gr.Dropdown(["wav FLOAT", "flac PCM_16", "flac PCM_24"],
                                            value="wav FLOAT", label="Export format")
                    ae_tta = gr.Checkbox(label="Use TTA")
                    ae_inst = gr.Checkbox(label="Extract instrumental")
                    ae_btn = gr.Button("Run ensemble", variant="primary")
                    # presets: persisted model-selection bundles
                    # (reference gui.py presets / config_manager.py:96-128)
                    with gr.Accordion("Presets", open=False):
                        preset_dd = gr.Dropdown(
                            choices=sorted(config["presets"]), label="Preset")
                        preset_name = gr.Textbox(label="New preset name")
                        with gr.Row():
                            preset_load = gr.Button("Load")
                            preset_save = gr.Button("Save")
                            preset_del = gr.Button("Delete")
                        preset_status = gr.Markdown()
                with gr.Column():
                    ae_progress = gr.HTML(progress_html(0))
                    ae_out = gr.Audio(label="Ensemble output")
            ae_btn.click(run_auto_ensemble,
                         [ae_audio, ae_models, ae_chunk, ae_overlap, ae_type,
                          ae_format, ae_tta, ae_inst],
                         [ae_progress, ae_out])

            def _decorate(models):
                return [f"{m} ⭐" if m in favorites else m for m in models]

            def preset_save_fn(name, category, models, etype, chunk, overlap):
                if not name:
                    return gr.update(), "Enter a preset name first"
                # record the category too (reference gui.py:729-766 saves
                # auto_category_dropdown): without it the loaded model
                # names may be absent from the CheckboxGroup's choices
                config["presets"] = cm.save_preset(
                    config["presets"], name,
                    [m.replace(" ⭐", "") for m in (models or [])], etype,
                    chunk_size=chunk, overlap=overlap,
                    auto_category_dropdown=category)
                cm.save_config(favorites, settings, config["presets"])
                return (gr.update(choices=sorted(config["presets"]), value=name),
                        f"Preset '{name}' saved")

            def preset_delete_fn(name):
                if not name:
                    return gr.update(), "Select a preset to delete"
                config["presets"] = cm.delete_preset(config["presets"], name)
                cm.save_config(favorites, settings, config["presets"])
                return (gr.update(choices=sorted(config["presets"]), value=None),
                        f"Preset '{name}' deleted")

            def preset_load_fn(name):
                p = config["presets"].get(name)
                if not p:
                    return (gr.update(), gr.update(), gr.update(), gr.update(),
                            gr.update(), "Select a preset to load")
                cat = p.get("auto_category_dropdown") or "Vocal Models"
                return (gr.update(value=cat),
                        gr.update(choices=_model_choices(cat, favorites),
                                  value=_decorate(p.get("models", []))),
                        gr.update(value=p.get("ensemble_method", "avg_wave")),
                        gr.update(value=p.get("chunk_size") or settings["chunk_size"]),
                        gr.update(value=p.get("overlap") or settings["overlap"]),
                        f"Preset '{name}' loaded")

            preset_save.click(preset_save_fn,
                              [preset_name, ae_category, ae_models, ae_type,
                               ae_chunk, ae_overlap],
                              [preset_dd, preset_status])
            preset_del.click(preset_delete_fn, [preset_dd],
                             [preset_dd, preset_status])
            preset_load.click(preset_load_fn, [preset_dd],
                              [ae_category, ae_models, ae_type, ae_chunk,
                               ae_overlap, preset_status])

        with gr.Tab("Download Sources"):
            url_in = gr.Textbox(label="URL (direct / Google Drive / YouTube)")
            dl_btn = gr.Button("Download")
            dl_status = gr.Markdown()
            dl_audio = gr.Audio(label="Downloaded audio")
            dl_btn.click(run_download, url_in, [dl_status, dl_audio])

        with gr.Tab("Manual Ensemble"):
            me_files = gr.File(file_count="multiple", label="Separated files")
            me_method = gr.Dropdown(list(ENSEMBLE_METHODS), value="avg_wave",
                                    label="Method")
            me_weights = gr.Textbox(label="Weights (space separated, optional)")
            me_btn = gr.Button("Ensemble")
            me_progress = gr.HTML(progress_html(0))
            me_out = gr.Audio(label="Output")
            me_btn.click(run_manual_ensemble, [me_files, me_method, me_weights],
                         [me_progress, me_out])

        with gr.Tab("Phase Fixer"):
            gr.Markdown("Transfer vocal-model phase into an instrumental stem. "
                        f"Curated sources: {len(SOURCE_MODELS)}, targets: {len(TARGET_MODELS)}")
            pf_source = gr.File(label="Source (vocal stem)")
            pf_target = gr.File(label="Target (instrumental stem)")
            pf_low = gr.Slider(100, 2000, value=500, label="Low cutoff (Hz)")
            pf_high = gr.Slider(3000, 16000, value=9000, label="High cutoff (Hz)")
            pf_scale = gr.Slider(0.5, 3.0, value=1.4, label="Scale factor")
            pf_btn = gr.Button("Fix phase")
            pf_status = gr.Markdown()
            pf_out = gr.Audio(label="Fixed instrumental")
            pf_btn.click(run_phase_fix, [pf_source, pf_target, pf_low, pf_high, pf_scale],
                         [pf_status, pf_out])

        with gr.Tab("Batch Processing"):
            bp_folder = gr.Textbox(label="Input folder")
            bp_category = gr.Dropdown(choices=_categories(), value="Vocal Models",
                                      label="Category")
            bp_model = gr.Dropdown(choices=_model_choices("Vocal Models", favorites),
                                   label="Model")
            bp_category.change(lambda c: gr.update(choices=_model_choices(c, favorites)),
                               bp_category, bp_model)
            bp_chunk = gr.Number(value=settings["chunk_size"], label="Chunk size")
            bp_overlap = gr.Slider(2, 50, value=2, step=1, label="Overlap")
            bp_format = gr.Dropdown(["wav FLOAT", "flac PCM_16", "flac PCM_24"],
                                    value="wav FLOAT", label="Export format")
            bp_btn = gr.Button("Process folder", variant="primary")
            bp_status = gr.Markdown()
            bp_files = gr.File(file_count="multiple", label="Outputs")
            bp_btn.click(run_batch, [bp_folder, bp_model, bp_chunk, bp_overlap, bp_format],
                         [bp_status, bp_files])

        with gr.Tab("Custom Models"):
            cm_name = gr.Textbox(label="Model name")
            cm_type = gr.Dropdown(["auto", "bs_roformer", "mel_band_roformer", "mdx23c",
                                   "scnet", "bandit_v2", "htdemucs"], value="auto",
                                  label="Model type")
            cm_ckpt = gr.Textbox(label="Checkpoint URL")
            cm_cfg = gr.Textbox(label="Config URL")
            cm_btn = gr.Button("Add model")
            cm_status = gr.Markdown()

            def add_custom_and_refresh(name, mtype, ckpt_url, cfg_url):
                # refresh the category dropdowns so the just-added model is
                # selectable without a restart (reference gui.py:1352)
                msg = add_custom(name, mtype, ckpt_url, cfg_url)
                cats = gr.update(choices=_categories())
                return msg, cats, cats, cats

            cm_btn.click(add_custom_and_refresh,
                         [cm_name, cm_type, cm_ckpt, cm_cfg],
                         [cm_status, category, ae_category, bp_category])

    return app
