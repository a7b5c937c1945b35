"""Canonical API walkthrough (reference: CosyVoice/example.py:7-112).

Shows the full public API of the TPU framework: zero-shot voice cloning,
saved-speaker reuse, fine-grained paralinguistic markup, instructed
synthesis (dialect/emotion), bistream-style segmented input, and voice
conversion — all through the CosyVoice3/AutoModel surface.

Usage: python example.py --model_dir <dir-with-converted-checkpoints> \
                         --prompt_wav <3s+ reference voice>
"""

import argparse

from fangyan_tts_tpu.api import AutoModel
from fangyan_tts_tpu.data.audio import write_wav


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--prompt_wav", required=True)
    parser.add_argument("--out_prefix", default="example")
    args = parser.parse_args()

    cosyvoice = AutoModel(model_dir=args.model_dir)

    # 1. zero-shot voice cloning: prompt text must transcribe prompt_wav
    prompt_text = "希望你以后能够做的比我还好呦。"
    for i, out in enumerate(
        cosyvoice.inference_zero_shot(
            "收到好友从远方寄来的生日礼物，那份意外的惊喜与深深的祝福让我心中充满了甜蜜的快乐，笑容如花儿般绽放。",
            prompt_text,
            args.prompt_wav,
        )
    ):
        write_wav(f"{args.out_prefix}_zero_shot_{i}.wav", out["tts_speech"], cosyvoice.sample_rate)

    # 2. save the speaker for reuse, then synthesize by speaker id
    cosyvoice.add_zero_shot_spk(prompt_text, args.prompt_wav, "my_zero_shot_spk")
    for i, out in enumerate(
        cosyvoice.inference_zero_shot("这是用保存的说话人合成的句子。", "", "", zero_shot_spk_id="my_zero_shot_spk")
    ):
        write_wav(f"{args.out_prefix}_saved_spk_{i}.wav", out["tts_speech"], cosyvoice.sample_rate)
    cosyvoice.save_spkinfo()

    # 3. fine-grained paralinguistic control
    for i, out in enumerate(
        cosyvoice.inference_cross_lingual("在他讲述那个荒诞故事的过程中，他突然[laughter]停下来，因为他自己也被逗笑了[laughter]。", args.prompt_wav)
    ):
        write_wav(f"{args.out_prefix}_fine_grained_{i}.wav", out["tts_speech"], cosyvoice.sample_rate)

    # 4. instructed synthesis: dialect
    for i, out in enumerate(
        cosyvoice.inference_instruct2("收到好友从远方寄来的生日礼物，我心中充满了快乐。", "请用四川话说。<|endofprompt|>", args.prompt_wav)
    ):
        write_wav(f"{args.out_prefix}_instruct_dialect_{i}.wav", out["tts_speech"], cosyvoice.sample_rate)

    # 5. instructed synthesis: emotion
    for i, out in enumerate(
        cosyvoice.inference_instruct2("今天真是太开心啦！", "请非常开心地说一句话。<|endofprompt|>", args.prompt_wav)
    ):
        write_wav(f"{args.out_prefix}_instruct_emotion_{i}.wav", out["tts_speech"], cosyvoice.sample_rate)

    # 6. streaming synthesis (chunked audio out)
    chunks = []
    for out in cosyvoice.inference_zero_shot("流式合成的音频是一块一块产生的。", prompt_text, args.prompt_wav, stream=True):
        chunks.append(out["tts_speech"])
    import numpy as np

    write_wav(f"{args.out_prefix}_stream.wav", np.concatenate(chunks), cosyvoice.sample_rate)

    # 7. voice conversion: speak source content in the prompt voice
    for i, out in enumerate(cosyvoice.inference_vc(args.prompt_wav, args.prompt_wav)):
        write_wav(f"{args.out_prefix}_vc_{i}.wav", out["tts_speech"], cosyvoice.sample_rate)

    # 8. bistream: text arrives as a generator (LLM-agent integration,
    # reference example.py text_generator) — tokens interleave 5 text : 15
    # speech and audio streams out while text is still arriving
    def text_generator():
        yield "收到好友从远方寄来的生日礼物，"
        yield "那份意外的惊喜与深深的祝福"
        yield "让我心中充满了甜蜜的快乐，"
        yield "笑容如花儿般绽放。"

    chunks = [
        out["tts_speech"]
        for out in cosyvoice.inference_zero_shot(text_generator(), prompt_text, args.prompt_wav, stream=True)
    ]
    write_wav(f"{args.out_prefix}_bistream.wav", np.concatenate(chunks), cosyvoice.sample_rate)

    print("done — wrote example_*.wav")


if __name__ == "__main__":
    main()
