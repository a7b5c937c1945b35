"""Gradio web demo (reference: CosyVoice/webui.py:29-174): four modes
(pretrained voice / 3s voice clone / cross-lingual / natural-language
instruct), seed control, streaming toggle.

gradio is not installed in the build image; the app constructs lazily and
fails with a clear message if the dependency is absent.
"""

import argparse
import random
import sys

import numpy as np

MODES = ["预训练音色", "3s极速复刻", "跨语种复刻", "自然语言控制"]
INSTRUCT_EXAMPLES = ["请用四川话说。<|endofprompt|>", "请非常开心地说一句话。<|endofprompt|>"]


def build_app(cosyvoice):
    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed in this environment; run the HTTP/gRPC servers instead:", file=sys.stderr)
        print("  python -m fangyan_tts_tpu.runtime.http_server --model_dir <dir>", file=sys.stderr)
        raise SystemExit(1)

    def generate(tts_text, mode, spk_id, prompt_text, prompt_wav, instruct_text, seed, stream):
        if seed:
            random.seed(int(seed))
        if mode == MODES[0]:
            gen = cosyvoice.inference_sft(tts_text, spk_id, stream=stream)
        elif mode == MODES[1]:
            gen = cosyvoice.inference_zero_shot(tts_text, prompt_text, prompt_wav, stream=stream)
        elif mode == MODES[2]:
            gen = cosyvoice.inference_cross_lingual(tts_text, prompt_wav, stream=stream)
        else:
            gen = cosyvoice.inference_instruct2(tts_text, instruct_text, prompt_wav, stream=stream)
        for out in gen:
            yield (cosyvoice.sample_rate, (np.clip(out["tts_speech"], -1, 1) * 32767).astype(np.int16))

    with gr.Blocks(title="fangyan-tts-tpu") as demo:
        gr.Markdown("## fangyan-tts-tpu — dialect & emotion TTS on TPU")
        tts_text = gr.Textbox(label="合成文本", value="你好，我是通义生成式语音大模型。")
        mode = gr.Radio(choices=MODES, value=MODES[1], label="推理模式")
        spk_id = gr.Dropdown(choices=cosyvoice.list_available_spks() or [""], label="预训练音色")
        prompt_text = gr.Textbox(label="prompt文本")
        prompt_wav = gr.Audio(sources=["upload", "microphone"], type="filepath", label="prompt音频 (≥3s)")
        instruct_text = gr.Textbox(label="instruct文本", value=INSTRUCT_EXAMPLES[0])
        seed = gr.Number(value=0, label="随机种子")
        stream = gr.Checkbox(value=False, label="流式推理")
        btn = gr.Button("生成音频")
        audio = gr.Audio(label="合成音频", streaming=True, autoplay=True)
        btn.click(generate, [tts_text, mode, spk_id, prompt_text, prompt_wav, instruct_text, seed, stream], [audio])
    return demo


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--model_dir", type=str, required=True)
    args = parser.parse_args()

    from fangyan_tts_tpu.api import AutoModel

    cosyvoice = AutoModel(model_dir=args.model_dir)
    demo = build_app(cosyvoice)
    demo.queue().launch(server_name="0.0.0.0", server_port=args.port)


if __name__ == "__main__":
    main()
